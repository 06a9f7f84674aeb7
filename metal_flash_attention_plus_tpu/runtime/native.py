"""ctypes bindings to the C++ runtime (cpp/mfa_runtime.cc).

The native library owns the serving-side host logic: block-config
resolution, calibration cache, the paged KV allocator, and the
continuous-batching scheduler (see cpp/mfa_runtime.h for the architecture
rationale — the counterpart of the reference's C++ engine layer,
``Documentation/CppReference/``).

The library is built on demand (``make -C cpp`` / cmake) and loaded with
ctypes; ``native_available()`` reports whether it is usable.  The pieces the
compute path depends on (block resolution) have pure-Python equivalents in
``attention/tuning.py``; the serving engine REQUIRES the native library.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

_REPO_ROOT = Path(__file__).resolve().parents[2]
_CPP_DIR = _REPO_ROOT / "cpp"
_LIB_CANDIDATES = (
    _CPP_DIR / "libmfa_runtime.so",
    _CPP_DIR / "build" / "libmfa_runtime.so",
)

_lib = None
_lib_lock = threading.Lock()


class _MfaBlockConfig(ctypes.Structure):
    _fields_ = [
        ("block_q", ctypes.c_int32),
        ("block_kv", ctypes.c_int32),
        ("block_kv_major", ctypes.c_int32),
        ("block_q_dkv", ctypes.c_int32),
        ("block_kv_dkv", ctypes.c_int32),
        ("block_q_dq", ctypes.c_int32),
        ("block_kv_dq", ctypes.c_int32),
    ]


class _MfaGemmBlockConfig(ctypes.Structure):
    _fields_ = [
        ("block_m", ctypes.c_int32),
        ("block_n", ctypes.c_int32),
        ("block_k", ctypes.c_int32),
    ]


class _MfaRequest(ctypes.Structure):
    _fields_ = [
        ("request_id", ctypes.c_int64),
        ("prompt_len", ctypes.c_int32),
        ("max_new_tokens", ctypes.c_int32),
    ]


class _MfaScheduledItem(ctypes.Structure):
    _fields_ = [
        ("request_id", ctypes.c_int64),
        ("seq_handle", ctypes.c_int64),
        ("kind", ctypes.c_int32),
        ("chunk_start", ctypes.c_int32),
        ("chunk_len", ctypes.c_int32),
    ]


def _build() -> Optional[Path]:
    """Build libmfa_runtime.so with make (fallback: direct g++)."""
    try:
        subprocess.run(
            ["make", "-C", str(_CPP_DIR), "libmfa_runtime.so"],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_CANDIDATES[0]
    except (subprocess.SubprocessError, OSError):
        pass
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared",
             "-o", str(_LIB_CANDIDATES[0]), str(_CPP_DIR / "mfa_runtime.cc")],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_CANDIDATES[0]
    except (subprocess.SubprocessError, OSError):
        return None


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if os.environ.get("MFA_NO_NATIVE_BUILD") != "1":
            # make is dependency-tracked: a fresh .so is a no-op, a stale
            # one (source newer) rebuilds.
            path = _build()
        else:
            path = None
        if path is None:
            path = next((p for p in _LIB_CANDIDATES if p.exists()), None)
        if path is None or not path.exists():
            return None
        lib = ctypes.CDLL(str(path))
        lib.mfa_resolve_blocks.restype = ctypes.c_int
        lib.mfa_resolve_blocks.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.POINTER(_MfaBlockConfig),
        ]
        lib.mfa_fwd_step_vmem_bytes.restype = ctypes.c_int64
        lib.mfa_resolve_gemm_blocks.restype = ctypes.c_int
        lib.mfa_resolve_gemm_blocks.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.POINTER(_MfaGemmBlockConfig),
        ]
        lib.mfa_calib_open.restype = ctypes.c_void_p
        lib.mfa_calib_open.argtypes = [ctypes.c_char_p]
        lib.mfa_calib_get.restype = ctypes.c_int
        lib.mfa_calib_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(_MfaBlockConfig), ctypes.POINTER(ctypes.c_double),
        ]
        lib.mfa_calib_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(_MfaBlockConfig), ctypes.c_double,
        ]
        lib.mfa_calib_save.argtypes = [ctypes.c_void_p]
        lib.mfa_calib_save.restype = ctypes.c_int
        lib.mfa_calib_size.argtypes = [ctypes.c_void_p]
        lib.mfa_calib_size.restype = ctypes.c_int
        lib.mfa_calib_close.argtypes = [ctypes.c_void_p]
        lib.mfa_pool_create.restype = ctypes.c_void_p
        lib.mfa_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.mfa_pool_free_pages.argtypes = [ctypes.c_void_p]
        lib.mfa_pool_free_pages.restype = ctypes.c_int32
        lib.mfa_seq_create.argtypes = [ctypes.c_void_p]
        lib.mfa_seq_create.restype = ctypes.c_int64
        lib.mfa_seq_reserve.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32
        ]
        lib.mfa_seq_reserve.restype = ctypes.c_int
        lib.mfa_seq_pages.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.mfa_seq_pages.restype = ctypes.c_int32
        lib.mfa_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.mfa_seq_len.restype = ctypes.c_int32
        lib.mfa_seq_set_len.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32
        ]
        lib.mfa_seq_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.mfa_sched_create.restype = ctypes.c_void_p
        lib.mfa_sched_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32
        ]
        lib.mfa_sched_destroy.argtypes = [ctypes.c_void_p]
        lib.mfa_sched_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(_MfaRequest)
        ]
        lib.mfa_sched_submit.restype = ctypes.c_int
        lib.mfa_sched_next_step.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(_MfaScheduledItem), ctypes.c_int32
        ]
        lib.mfa_sched_next_step.restype = ctypes.c_int32
        lib.mfa_sched_token.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
        ]
        lib.mfa_sched_token.restype = ctypes.c_int
        lib.mfa_sched_num_waiting.argtypes = [ctypes.c_void_p]
        lib.mfa_sched_num_waiting.restype = ctypes.c_int32
        lib.mfa_sched_num_preempted.argtypes = [ctypes.c_void_p]
        lib.mfa_sched_num_preempted.restype = ctypes.c_int64
        lib.mfa_sched_num_running.argtypes = [ctypes.c_void_p]
        lib.mfa_sched_num_running.restype = ctypes.c_int32
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    block_q: int
    block_kv: int
    block_kv_major: int
    block_q_dkv: int
    block_kv_dkv: int
    block_q_dq: int
    block_kv_dq: int

    @staticmethod
    def _from_c(c: _MfaBlockConfig) -> "BlockConfig":
        return BlockConfig(
            c.block_q, c.block_kv, c.block_kv_major, c.block_q_dkv,
            c.block_kv_dkv, c.block_q_dq, c.block_kv_dq,
        )

    def _to_c(self) -> _MfaBlockConfig:
        return _MfaBlockConfig(
            self.block_q, self.block_kv, self.block_kv_major,
            self.block_q_dkv,
            self.block_kv_dkv, self.block_q_dq, self.block_kv_dq,
        )

    def to_block_sizes(self):
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            BlockSizes,
        )

        return BlockSizes(**dataclasses.asdict(self))


KIND_FWD, KIND_FWD_Q, KIND_BWD = 0, 1, 2


def device_vmem_budget(device_kind: str) -> int:
    """Per-generation resolver VMEM budget in bytes (the reference's
    apple9-vs-older table key); conservative for unknown kinds.  Python
    fallback mirrors ``cpp/mfa_runtime.cc::mfa_device_vmem_budget``."""
    lib = _load()
    if lib is not None:
        try:
            fn = lib.mfa_device_vmem_budget
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_char_p]
            return int(fn(device_kind.encode()))
        except AttributeError:  # stale .so without the symbol
            pass
    from metal_flash_attention_plus_tpu.attention.tuning import (
        _GEN_VMEM_MIB,
        normalize_device_kind,
    )

    mib = _GEN_VMEM_MIB.get(normalize_device_kind(device_kind))
    return ((mib - 2) << 20) if mib else (7 << 20)


def resolve_blocks(
    head_dim: int, bits: int = 16, kind: int = KIND_FWD,
    vmem_budget_bytes: int = 0, causal: bool = True,
    device_kind: Optional[str] = None,
) -> BlockConfig:
    """Native descriptor → block-config resolution; falls back to the
    Python table when the library is unavailable.  ``device_kind`` (a raw
    jax device_kind string) keys the budget per device generation when
    ``vmem_budget_bytes`` is not given explicitly."""
    if not vmem_budget_bytes and device_kind is not None:
        vmem_budget_bytes = device_vmem_budget(device_kind)
    lib = _load()
    if lib is None:
        from metal_flash_attention_plus_tpu.attention.tuning import (
            default_block_sizes,
        )

        bs = default_block_sizes(head_dim, bits, causal, device_kind)
        return BlockConfig(**dataclasses.asdict(bs))
    out = _MfaBlockConfig()
    rc = lib.mfa_resolve_blocks(
        head_dim, bits, kind, int(causal), vmem_budget_bytes,
        ctypes.byref(out),
    )
    if rc != 0:
        raise ValueError(f"mfa_resolve_blocks failed for head_dim={head_dim}")
    return BlockConfig._from_c(out)


GEMM_DYNAMIC, GEMM_WEIGHT_ONLY = 0, 1


def resolve_gemm_blocks(
    m: int, bits: int = 8, mode: int = GEMM_DYNAMIC,
    vmem_budget_bytes: int = 0,
) -> Tuple[int, int, int]:
    """Native quantized-GEMM block resolution; falls back to the Python
    m-bucketed table when the library is unavailable."""
    lib = _load()
    if lib is None:
        from metal_flash_attention_plus_tpu.attention.tuning import (
            default_gemm_blocks,
        )

        return default_gemm_blocks(m, bits)
    out = _MfaGemmBlockConfig()
    rc = lib.mfa_resolve_gemm_blocks(
        m, bits, mode, vmem_budget_bytes, ctypes.byref(out)
    )
    if rc != 0:
        raise ValueError(f"mfa_resolve_gemm_blocks failed for m={m}")
    return (out.block_m, out.block_n, out.block_k)


class CalibCache:
    """Native flat-file calibration cache."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.mfa_calib_open(path.encode())

    def get(self, key: str) -> Optional[Tuple[BlockConfig, float]]:
        cfg = _MfaBlockConfig()
        tf = ctypes.c_double()
        if self._lib.mfa_calib_get(
            self._h, key.encode(), ctypes.byref(cfg), ctypes.byref(tf)
        ):
            return BlockConfig._from_c(cfg), tf.value
        return None

    def put(self, key: str, cfg: BlockConfig, tflops: float):
        c = cfg._to_c()
        self._lib.mfa_calib_put(self._h, key.encode(), ctypes.byref(c), tflops)

    def save(self) -> bool:
        return self._lib.mfa_calib_save(self._h) == 0

    def __len__(self) -> int:
        return self._lib.mfa_calib_size(self._h)

    def close(self):
        if self._h:
            self._lib.mfa_calib_close(self._h)
            self._h = None


class PagePool:
    """Native paged KV-cache allocator."""

    def __init__(self, num_pages: int, page_tokens: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.mfa_pool_create(num_pages, page_tokens)
        if not self._h:
            raise ValueError("invalid pool parameters")
        self.page_tokens = page_tokens

    @property
    def free_pages(self) -> int:
        return self._lib.mfa_pool_free_pages(self._h)

    def create_seq(self) -> int:
        return self._lib.mfa_seq_create(self._h)

    def reserve(self, seq: int, num_tokens: int) -> bool:
        return self._lib.mfa_seq_reserve(self._h, seq, num_tokens) == 0

    def pages(self, seq: int, max_pages: int = 4096) -> List[int]:
        buf = (ctypes.c_int32 * max_pages)()
        n = self._lib.mfa_seq_pages(self._h, seq, buf, max_pages)
        return list(buf[:n])

    def seq_len(self, seq: int) -> int:
        return self._lib.mfa_seq_len(self._h, seq)

    def set_seq_len(self, seq: int, n: int):
        self._lib.mfa_seq_set_len(self._h, seq, n)

    def release(self, seq: int):
        self._lib.mfa_seq_release(self._h, seq)

    def destroy(self):
        if self._h:
            self._lib.mfa_pool_destroy(self._h)
            self._h = None


@dataclasses.dataclass(frozen=True)
class ScheduledItem:
    request_id: int
    seq_handle: int
    kind: int  # 0 = prefill, 1 = decode
    chunk_start: int
    chunk_len: int

    PREFILL = 0
    DECODE = 1


class Scheduler:
    """Native continuous-batching scheduler."""

    def __init__(self, pool: PagePool, max_batch: int, token_budget: int):
        self._lib = pool._lib
        self._h = self._lib.mfa_sched_create(pool._h, max_batch, token_budget)
        if not self._h:
            raise ValueError("invalid scheduler parameters")

    def submit(self, request_id: int, prompt_len: int, max_new_tokens: int):
        req = _MfaRequest(request_id, prompt_len, max_new_tokens)
        if self._lib.mfa_sched_submit(self._h, ctypes.byref(req)) != 0:
            raise RuntimeError("scheduler queue full")

    def next_step(self, max_items: int = 256) -> List[ScheduledItem]:
        buf = (_MfaScheduledItem * max_items)()
        n = self._lib.mfa_sched_next_step(self._h, buf, max_items)
        return [
            ScheduledItem(
                it.request_id, it.seq_handle, it.kind,
                it.chunk_start, it.chunk_len,
            )
            for it in buf[:n]
        ]

    def report_token(self, request_id: int, finished: bool = False):
        self._lib.mfa_sched_token(self._h, request_id, int(finished))

    def set_decode_chunk(self, n: int):
        """Decode tokens granted (and KV slots reserved) per decode item
        per step — >1 enables the engine's FUSED multi-step decode (the
        grant rides each item's chunk_len)."""
        try:
            fn = self._lib.mfa_sched_set_decode_chunk
        except AttributeError:  # stale .so — single-token grants only
            return
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        fn.restype = None
        fn(self._h, int(n))

    @property
    def num_waiting(self) -> int:
        return self._lib.mfa_sched_num_waiting(self._h)

    @property
    def num_running(self) -> int:
        return self._lib.mfa_sched_num_running(self._h)

    @property
    def num_preempted(self) -> int:
        """Total mid-stream preemptions (recompute policy)."""
        return self._lib.mfa_sched_num_preempted(self._h)

    def destroy(self):
        if self._h:
            self._lib.mfa_sched_destroy(self._h)
            self._h = None
