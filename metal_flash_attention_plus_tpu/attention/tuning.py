"""Block-size tables + on-device autotuner with persistent calibration.

TPU-native analog of two reference subsystems:

- The hand-tuned per-device parameter tables
  (``AttentionDescriptor+Parameters.swift:74-292`` — rows keyed on max head
  dim selecting block shapes / cached operands).  Here the cold-start table
  is keyed on (head_dim, bits) and derived from the VMEM budget: the padded
  Q/K/V tiles + fp32 accumulator + softmax stats must fit ~16 MB with
  double buffering.
- ``MaskingStrategyHeuristic`` + ``MaskingCalibrationStore``
  (``MaskingStrategyHeuristic.swift:59-302, 415-448``): a data-driven
  selector with an on-disk per-device JSON calibration cache
  (``~/.cache/FlashAttention/masking-calibration/<device>.json`` there;
  ``~/.cache/metal_flash_attention_plus_tpu/tuning/<device>.json`` here).
  The reference tunes bitmask-vs-elementWise masking; block-level skipping
  made that choice moot on TPU (masked tiles never become grid steps), so
  what is worth tuning is the block geometry itself.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
from pathlib import Path
from typing import Dict, Optional, Tuple

from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes

_SEQ_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768)


def seq_bucket(seq_len: int) -> int:
    """Bucket a sequence length like the reference's heuristic cache
    (``MaskingStrategyHeuristic.swift:31-57`` buckets 64..4096)."""
    for b in _SEQ_BUCKETS:
        if seq_len <= b:
            return b
    return _SEQ_BUCKETS[-1]


# Per-generation VMEM budgets (MiB/core) — the TPU analog of the
# reference's device-generation table key (apple9 vs older,
# ``AttentionDescriptor+Parameters.swift:13-42``).  v5e is the MEASURED
# basis (every number in the table below); other generations derive by
# budget: a roomier VMEM admits a deeper major slab (more MXU/VPU overlap),
# an unknown device gets a conservative slab (correctness first — the
# CalibrationStore then specializes it per device on first calibrate()).
_GEN_VMEM_MIB = {
    "v4": 16, "v5e": 16, "v5p": 16, "v6e": 32,
}


def normalize_device_kind(kind: str) -> str:
    """Map a raw ``jax.devices()[0].device_kind`` string to a table
    generation key ("v4"/"v5e"/"v5p"/"v6e") or "unknown"."""
    k = (kind or "").lower()
    if "v5 lite" in k or "v5e" in k or "v5lite" in k:
        return "v5e"
    if "v5p" in k or "v5" in k:
        return "v5p"
    if "v6" in k or "trillium" in k:
        return "v6e"
    if "v4" in k:
        return "v4"
    return "unknown"


def default_block_sizes(
    head_dim: int, bits: int = 16, causal: bool = True,
    device_kind: Optional[str] = None,
) -> BlockSizes:
    """VMEM-budget cold-start table (the parameter-table analog).

    Budget model per grid step (double-buffered): Q tile bq×D, K/V tiles
    bkv×D at ``bits`` width, fp32 accumulator bq×D, stats 2×bq×128.  Larger
    KV blocks amortize the per-block VPU softmax against MXU time — the
    same reasoning as the reference's traversal-block selection, with VMEM
    in place of registers.

    ``causal`` selects the ragged-schedule table (causal / sliding-window
    / sparse masks run the packed-pair grid, whose optimum differs from
    the full-mask dense grid at d=128 — docs/perf_notes.md).
    """
    # Measured on v5e AFTER the round-2 two-level rework (docs/perf_notes
    # .md "Two-level KV tiling"): block_kv_major is the per-grid-step KV
    # slab (inner unroll → MXU/VPU overlap).  S=4K solo sweeps, TF/s
    # (cross-run absolute noise ±10-20%; within-run rankings stable):
    #   float d=64  causal (512,512,M4096)=28   full (1024,1024,M2048)=48
    #   float d=128 (512,512,M2048)=57-96        d=256 (1024,512,M1024)=62-103
    #   int8  d=64 (1024,512,M1024)=27  d=128 (1024,1024,M2048)=48
    #   int4  d=256 (512,512,M2048)=58
    # The quantized kernel's dequant ×8 unroll (M4096) crashes Mosaic —
    # quantized majors cap at 2-4 inner tiles.
    if bits <= 8:
        if head_dim <= 64:
            bq, bkv, bkvm = 1024, 512, 1024
        elif head_dim <= 128:
            bq, bkv, bkvm = 1024, 1024, 2048
        elif bits == 4:
            # Slope-measured (exp23, v5e, two sessions): the FOLDED int4
            # path (CHANNEL/TENSOR/ROW symmetric — the default since
            # round 2) prefers (512,512,M2048): within-run it beats M1024
            # 113.3 vs 106.6 TF/s (K4V4) with K4V8 flat across the two
            # (116.0 vs 115.8).  The BLOCK_2D dequant kernel prefers
            # (1024,512,M1024) (93.1, exp21) — calibrate() overrides per
            # deployment if needed.
            bq, bkv, bkvm = 512, 512, 2048
        else:
            bq, bkv, bkvm = 512, 512, 2048
    elif head_dim > 128:
        bq, bkv, bkvm = 1024, 512, 1024
    elif causal and head_dim <= 64:
        bq, bkv, bkvm = 512, 512, 4096
    elif head_dim <= 64:
        bq, bkv, bkvm = 1024, 1024, 2048
    else:
        bq, bkv, bkvm = 512, 512, 2048
    # Device-generation adjustment (the apple9-vs-older analog): the
    # numbers above are v5e-measured.  A generation with MORE VMEM can
    # carry a deeper major slab (more inner unroll = more MXU/VPU
    # overlap), capped at 4 inner tiles (the Mosaic mega-body crash
    # boundary); an UNKNOWN device kind halves the slab instead —
    # conservative cold start, and the per-device CalibrationStore
    # specializes it on the first calibrate().
    if device_kind is not None:
        gen = normalize_device_kind(device_kind)
        budget = _GEN_VMEM_MIB.get(gen)
        if budget is None:
            bkvm = max(bkv, (bkvm // 2 // bkv) * bkv)
        elif budget > 16:
            bkvm = min(bkvm * (budget // 16), 4 * bkv)
    # Backward: (512, 512) for both kernels measured best at d=64/256
    # (33.7 / 85.2 TF/s); d=128 marginally prefers (1024, 512)+(512, 1024)
    # (66.2 vs 58.6) — kept uniform pending a finer sweep.
    return BlockSizes(
        block_q=bq,
        block_kv=bkv,
        block_kv_major=bkvm,
        block_q_dkv=min(bq, 512),
        block_kv_dkv=min(bkv, 512),
        block_q_dq=min(bq, 512),
        block_kv_dq=min(bkv, 512),
        # Backward two-level majors: +4-5% fwd+bwd at every head dim
        # (40.9/83.2/94.0 TF/s at d=64/128/256 vs single-level, v5e).
        block_kv_dq_major=2048,
        block_q_dkv_major=2048,
    )


_M_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


def m_bucket(m: int) -> int:
    """Bucket a GEMM M (token-count) dimension — decode (small M) and
    prefill (large M) live in different regimes (docs/perf_notes.md
    "Quantized GEMM")."""
    for b in _M_BUCKETS:
        if m <= b:
            return b
    return _M_BUCKETS[-1]


def default_gemm_blocks(m: int, bits: int = 8) -> Tuple[int, int, int]:
    """Cold-start (block_m, block_n, block_k) for the dynamic quantized
    GEMM.  Measured on v5e (docs/perf_notes.md): decode shapes (M ≤ 256)
    want a narrow M tile with deep N/K slabs — (128, 1024, 2048) is ~15%
    faster than the square default at M=128, N=K=8192; prefill optimum is
    (512, 1024, 1024) — 122.8 TF/s for the folded weight-only kernel at
    M=4096 N=K=8192, parity with XLA's own bf16 matmul at half the weight
    bytes.  int4 needs block_k % 256 (group-planar unpack) — both tables
    already satisfy it."""
    if m <= 256:
        return (128, 1024, 2048)
    return (512, 1024, 1024)


@dataclasses.dataclass(frozen=True)
class TuneKey:
    """Cache key: what the block geometry actually depends on."""

    kind: str  # "fwd" | "fwd_q" (quantized) | "bwd"
    head_dim: int
    bits: int
    seq_bucket: int
    causal: bool = True  # ragged (packed-pair) vs full-mask schedule

    def encode(self) -> str:
        m = "mC" if self.causal else "mF"
        return (
            f"{self.kind}:d{self.head_dim}:b{self.bits}"
            f":s{self.seq_bucket}:{m}"
        )

    @staticmethod
    def decode(s: str) -> "TuneKey":
        parts = s.split(":")
        kind, d, b, sb = parts[:4]
        causal = parts[4] == "mC" if len(parts) > 4 else True
        return TuneKey(kind, int(d[1:]), int(b[1:]), int(sb[1:]), causal)


class CalibrationStore:
    """Per-device JSON persistence (``MaskingCalibrationStore`` analog)."""

    def __init__(self, cache_dir: Optional[str] = None):
        base = cache_dir or os.environ.get(
            "MFA_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache",
                "metal_flash_attention_plus_tpu", "tuning",
            ),
        )
        self._dir = Path(base)

    def _path(self, device_kind: str) -> Path:
        safe = "".join(c if c.isalnum() else "-" for c in device_kind)
        return self._dir / f"{safe}.json"

    def load(self, device_kind: str) -> Dict[str, dict]:
        p = self._path(device_kind)
        if not p.exists():
            return {}
        try:
            return json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return {}

    def save(self, device_kind: str, entries: Dict[str, dict]) -> None:
        self._dir.mkdir(parents=True, exist_ok=True)
        tmp = self._path(device_kind).with_suffix(".tmp")
        tmp.write_text(json.dumps(entries, indent=1, sort_keys=True))
        tmp.replace(self._path(device_kind))


def _blocks_to_json(bs: BlockSizes) -> dict:
    return dataclasses.asdict(bs)


def _blocks_from_json(d: dict) -> BlockSizes:
    return BlockSizes(**d)


class AttentionTuner:
    """Process-global recommend/calibrate service (``MaskingStrategyHeuristic
    .shared`` analog: lock-guarded cache + measured calibration + JSON
    persistence)."""

    _instance: Optional["AttentionTuner"] = None
    _instance_lock = threading.Lock()

    def __init__(self, store: Optional[CalibrationStore] = None):
        self._lock = threading.Lock()
        self._store = store or CalibrationStore()
        self._cache: Dict[str, dict] = {}
        self._loaded_device: Optional[str] = None

    @classmethod
    def shared(cls) -> "AttentionTuner":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def _device_kind(self) -> str:
        import jax

        try:
            return jax.devices()[0].device_kind
        except Exception:
            return "unknown"

    def _ensure_loaded(self):
        dk = self._device_kind()
        if self._loaded_device != dk:
            self._cache = self._store.load(dk)
            self._loaded_device = dk

    def recommend(
        self, kind: str, head_dim: int, seq_len: int, bits: int = 16,
        causal: bool = True,
    ) -> BlockSizes:
        """Calibrated blocks if available, else the cold-start table."""
        key = TuneKey(
            kind, head_dim, bits, seq_bucket(seq_len), causal
        ).encode()
        with self._lock:
            self._ensure_loaded()
            entry = self._cache.get(key)
        if entry is not None:
            return _blocks_from_json(entry["blocks"])
        return default_block_sizes(
            head_dim, bits, causal, device_kind=self._device_kind()
        )

    def record(self, key: TuneKey, blocks: BlockSizes, tflops: float):
        with self._lock:
            self._ensure_loaded()
            self._cache[key.encode()] = {
                "blocks": _blocks_to_json(blocks),
                "tflops": round(tflops, 3),
            }
            self._store.save(self._device_kind(), self._cache)

    # -- GEMM kind (VERDICT r1 item 7: calibration for every dispatched
    # variant, not just attention fwd) ---------------------------------

    @staticmethod
    def _gemm_key(m: int, n: int, k: int, bits: int, mode: str) -> str:
        return f"gemm:{mode}:n{n}:k{k}:b{bits}:m{m_bucket(m)}"

    def recommend_gemm(
        self, m: int, n: int, k: int, bits: int = 8, mode: str = "dynamic"
    ) -> Tuple[int, int, int]:
        """Calibrated (block_m, block_n, block_k) for the quantized GEMMs
        if available, else the measured cold-start table.  ``mode``:
        "dynamic" (W8A8/W4A8 runtime activation quant) or "weight_only"
        (dequant-on-load)."""
        key = self._gemm_key(m, n, k, bits, mode)
        with self._lock:
            self._ensure_loaded()
            entry = self._cache.get(key)
        if entry is not None and "gemm_blocks" in entry:
            return tuple(entry["gemm_blocks"])
        return default_gemm_blocks(m, bits)

    def calibrate_gemm(
        self,
        m: int,
        n: int,
        k: int,
        *,
        bits: int = 8,
        mode: str = "dynamic",
        candidates: Optional[Tuple[Tuple[int, int, int], ...]] = None,
        iters: int = 20,
    ) -> Tuple[int, int, int]:
        """Time the ACTUALLY-DISPATCHED quantized GEMM over candidate
        block triples on the live device and persist the winner (same
        contract as :meth:`calibrate` — ``MaskingStrategyHeuristic.swift:
        207-302`` measures the dispatched variant, never a proxy)."""
        import jax
        import jax.numpy as jnp

        from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
            dynamic_quantized_matmul,
            quantized_matmul,
        )
        from metal_flash_attention_plus_tpu.quant.params import (
            QuantConfig,
            QuantGranularity,
        )
        from metal_flash_attention_plus_tpu.quant.tensor import quantize
        from metal_flash_attention_plus_tpu.utils.profiling import measure

        if mode not in ("dynamic", "weight_only"):
            raise ValueError(f"unknown GEMM calibration mode {mode!r}")
        if candidates is None:
            candidates = (
                (128, 1024, 2048), (128, 512, 2048), (256, 1024, 2048),
                (512, 512, 1024), (512, 1024, 1024), (512, 512, 512),
                (1024, 512, 1024),
            )
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        a = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
        w = jax.random.normal(ks[1], (n, k), jnp.float32)
        wq = quantize(
            w,
            QuantConfig(bits=bits, granularity=QuantGranularity.ROW),
        )
        flops = 2.0 * m * n * k
        mm = dynamic_quantized_matmul if mode == "dynamic" else (
            quantized_matmul
        )

        best: Tuple[float, Optional[Tuple[int, int, int]]] = (0.0, None)
        for bm, bn, bk in candidates:
            if bits == 4 and bk % 256 != 0:
                continue
            try:
                f = jax.jit(
                    lambda a, bm=bm, bn=bn, bk=bk: mm(
                        a, wq, block_m=bm, block_n=bn, block_k=bk,
                        interpret=None,
                    )
                )
                sec = measure(f, a, iters=iters, warmup=3)
            except Exception:
                continue
            tf = flops / sec / 1e12
            if tf > best[0]:
                best = (tf, (bm, bn, bk))
        if best[1] is None:
            return default_gemm_blocks(m, bits)
        with self._lock:
            self._ensure_loaded()
            self._cache[self._gemm_key(m, n, k, bits, mode)] = {
                "gemm_blocks": list(best[1]),
                "tflops": round(best[0], 3),
            }
            self._store.save(self._device_kind(), self._cache)
        return best[1]

    def calibrate(
        self,
        head_dim: int,
        seq_len: int,
        *,
        kind: str = "fwd",  # "fwd" | "fwd_q" | "bwd"
        bits: int = 16,
        batch: int = 1,
        num_heads: int = 8,
        causal: bool = True,
        candidates: Optional[Tuple[Tuple[int, int], ...]] = None,
        iters: int = 20,
    ) -> BlockSizes:
        """Measure candidates for the ACTUALLY-DISPATCHED kernel kind on the
        live device and persist the winner (``MaskingStrategyHeuristic
        .calibrate`` analog — the reference likewise times the real variant
        it will dispatch, ``MaskingStrategyHeuristic.swift:207-302``).

        ``kind``: "fwd" (float forward), "fwd_q" (quantized-KV forward at
        ``bits``), "bwd" (dQ + dKV kernels; candidates tune the backward
        block fields).
        """
        import jax
        import jax.numpy as jnp

        from metal_flash_attention_plus_tpu.attention.masking import (
            CAUSAL,
            FULL,
        )
        from metal_flash_attention_plus_tpu.utils.profiling import measure
        from metal_flash_attention_plus_tpu.utils.roofline import (
            attention_flops,
        )

        if kind not in ("fwd", "fwd_q", "bwd"):
            raise ValueError(f"unknown calibration kind {kind!r}")
        if candidates is None:
            # (bq, bkv[, bkv_major]) — two-level geometries lead.
            candidates = (
                (512, 512, 4096), (512, 512, 2048), (1024, 512, 1024),
                (1024, 1024, 2048), (512, 1024, 2048), (512, 512),
                (1024, 1024), (256, 512),
            )
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (batch, num_heads, seq_len, head_dim)
        q = jax.random.normal(ks[0], shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], shape, jnp.bfloat16)
        v = jax.random.normal(ks[2], shape, jnp.bfloat16)
        fwd_flops = attention_flops(
            seq_len, seq_len, head_dim, num_heads=num_heads, batch=batch
        ) / (2 if causal else 1)
        # Backward ≈ (7D+10)/(2D+5) × forward by the reference's op model.
        flops = fwd_flops * (
            (7 * head_dim + 10) / (2 * head_dim + 5) if kind == "bwd" else 1
        )
        mask = CAUSAL if causal else FULL

        def make_fn(bs: BlockSizes):
            if kind == "fwd":
                from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E501
                    flash_attention_forward,
                )

                return jax.jit(
                    lambda q, k, v: flash_attention_forward(
                        q, k, v, mask=mask, block_sizes=bs, interpret=None
                    )[0]
                ), (q, k, v)
            if kind == "fwd_q":
                from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E501
                    quantized_flash_attention_forward,
                )
                from metal_flash_attention_plus_tpu.quant.params import (
                    QuantConfig,
                    QuantGranularity,
                    QuantStrategy,
                )
                from metal_flash_attention_plus_tpu.quant.tensor import (
                    quantize,
                )

                cfg = QuantConfig(
                    bits=bits if bits in (4, 8) else 8,
                    granularity=QuantGranularity.ROW,
                    strategy=QuantStrategy.CENTERED,
                )
                kq, vq = quantize(k, cfg), quantize(v, cfg)
                return jax.jit(
                    lambda q: quantized_flash_attention_forward(
                        q, kq, vq, mask=mask, block_sizes=bs,
                        interpret=None,
                    )[0]
                ), (q,)
            # kind == "bwd": time dQ + dKV from saved residuals.
            from metal_flash_attention_plus_tpu.ops.flash_attention import (
                flash_attention_forward,
            )
            from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (  # noqa: E501
                flash_attention_backward,
            )

            o, l = jax.jit(
                lambda q, k, v: flash_attention_forward(
                    q, k, v, mask=mask, interpret=None
                )
            )(q, k, v)
            do = jnp.ones_like(q)
            return jax.jit(
                lambda q, k, v, o, l, do: flash_attention_backward(
                    q, k, v, o, l, do, mask=mask, block_sizes=bs,
                    interpret=None,
                )[0]
            ), (q, k, v, o, l, do)

        best: Tuple[float, Optional[BlockSizes]] = (0.0, None)
        for cand in candidates:
            bq, bkv = cand[0], cand[1]
            bkvm = cand[2] if len(cand) > 2 else 0
            if bq > seq_len + 127 or bkv > seq_len + 127:
                continue
            if kind == "bwd":
                bs = BlockSizes(
                    block_q=512, block_kv=512,
                    block_q_dkv=bq, block_kv_dkv=bkv,
                    block_q_dq=bq, block_kv_dq=bkv,
                )
            else:
                bs = BlockSizes(
                    block_q=bq, block_kv=bkv, block_kv_major=bkvm,
                    block_q_dkv=min(bq, 512),
                    block_kv_dkv=min(bkv, 512),
                    block_q_dq=min(bq, 512), block_kv_dq=min(bkv, 512),
                )
            try:
                f, args = make_fn(bs)
                sec = measure(f, *args, iters=iters, warmup=3)
            except Exception:
                continue
            tf = flops / sec / 1e12
            if tf > best[0]:
                best = (tf, bs)
        if best[1] is None:
            return default_block_sizes(head_dim, bits, causal)
        key = TuneKey(kind, head_dim, bits, seq_bucket(seq_len), causal)
        self.record(key, best[1], best[0])
        return best[1]

    def calibrate_all(
        self,
        head_dims=(64, 128, 256),
        seq_lens=(4096,),
        *,
        causals=(True, False),
        gemm_shapes=((128, 8192, 8192), (4096, 8192, 8192)),
        iters: int = 20,
    ) -> Dict[str, dict]:
        """Sweep {fwd, fwd_q(8), fwd_q(4), bwd} × head dims × seqs × masks
        plus the GEMM kinds over ``gemm_shapes`` and persist every winner —
        the per-device calibration pass the reference runs via
        ``warmUp(persistTo:)``."""
        for d in head_dims:
            for s in seq_lens:
                for causal in causals:
                    self.calibrate(d, s, kind="fwd", causal=causal,
                                   iters=iters)
                    for b in (8, 4):
                        self.calibrate(d, s, kind="fwd_q", bits=b,
                                       causal=causal, iters=iters)
                    self.calibrate(d, s, kind="bwd", causal=causal,
                                   iters=iters)
        for (m, n, k) in gemm_shapes:
            for mode in ("dynamic", "weight_only"):
                self.calibrate_gemm(m, n, k, mode=mode, iters=iters)
        with self._lock:
            self._ensure_loaded()
            return dict(self._cache)
