"""Continuous-batching serving engine.

The host loop the north star asks for ("continuous batching of attention
workloads"): the C++ scheduler (cpp/mfa_runtime.cc via runtime/native.py)
decides WHAT runs each step — admission under batch-slot and KV-page
budgets, prefill-before-decode ordering, completion/eviction — and this
module executes the decisions on device: prefill fills pages, decodes run
batched through the paged-attention kernel with padded batch slots pointing
at the trash page.

Greedy sampling; per-request EOS/max-token termination.  Single-host here —
the multi-host extension shards the decode batch over the ``data`` mesh
axis (each host runs one engine; the scheduler state is host-local, the
model params are mesh-sharded), documented in docs/serving.md.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import types

from metal_flash_attention_plus_tpu.models.cached import (
    decode_step,
    init_cache,
)
from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
)
from metal_flash_attention_plus_tpu.runtime.native import (
    PagePool,
    ScheduledItem,
    Scheduler,
)


@dataclasses.dataclass
class GenerationRequest:
    request_id: int
    prompt: List[int]
    max_new_tokens: int
    eos_token: Optional[int] = None


def _gqa_executor():
    from metal_flash_attention_plus_tpu.models.cached import (
        decode_step, init_cache, prefill_chunk,
    )

    return types.SimpleNamespace(
        init_cache=init_cache,
        prefill_chunk=prefill_chunk,
        decode_step=decode_step,
    )


def mla_executor():
    """Executor for MLA models: latent-cache pages ([c | k_rope], Hkv=1)."""
    from metal_flash_attention_plus_tpu.models.cached_mla import (
        init_mla_cache, mla_decode_step, mla_prefill_chunk,
    )

    def init(cfg, num_pages, page_tokens, dtype, quantized=False):
        return init_mla_cache(
            cfg, num_pages, page_tokens, dtype, quantized=quantized
        )

    return types.SimpleNamespace(
        init_cache=init,
        prefill_chunk=mla_prefill_chunk,
        decode_step=mla_decode_step,
    )


_JIT_CACHE: Dict = {}


def _jitted_programs(prefill_chunk, decode_step, cfg):
    """(prefill_jit, decode_jit, decode_scan_jit) — cached per
    (executor fns, cfg) so successive ServingEngine instances with the
    same model/executor reuse the compiled programs instead of paying the
    30-90 s tunnel compile again (executor fns are module-level, cfg is a
    frozen dataclass — both hash stably)."""
    key = (prefill_chunk, decode_step, cfg)
    hit = _JIT_CACHE.get(key)
    if hit is not None:
        return hit

    # The cache argument is DONATED in every program: without donation
    # XLA materializes a fresh copy of the whole page pool per dispatch
    # (cache in → cache out), which at long context dwarfs the actual KV
    # read — measured as a per-tick cost scaling with POOL bytes, not
    # context bytes.  The engine always reassigns self.cache from the
    # result, so the donated input is never reused.
    prefill_jit = jax.jit(
        lambda params, tokens, offset, last_index, cache, page_row:
        prefill_chunk(
            params, tokens, offset, last_index, cache, page_row, cfg
        ),
        donate_argnums=(4,),
    )
    decode_jit = jax.jit(
        lambda params, tokens, lengths, pts, cache: decode_step(
            params, tokens, lengths, pts, cache, cfg
        ),
        donate_argnums=(4,),
    )

    def _decode_scan(params, tokens, lengths, pts, cache, n_steps):
        def body(carry, _):
            tok, ln, cache = carry
            logits, cache = decode_step(params, tok, ln, pts, cache, cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, ln + 1, cache), nxt

        (tok, ln, cache), toks = jax.lax.scan(
            body, (tokens, lengths, cache), None, length=n_steps
        )
        return toks, cache  # toks [T, B]

    decode_scan_jit = jax.jit(
        _decode_scan, static_argnames=("n_steps",), donate_argnums=(4,)
    )
    _JIT_CACHE[key] = (prefill_jit, decode_jit, decode_scan_jit)
    return _JIT_CACHE[key]


class ServingEngine:
    """Single-host continuous-batching engine over the paged KV cache."""

    def __init__(
        self,
        params,
        cfg: TransformerConfig,
        *,
        # 256-token pages are the measured default: the decode wave kernel
        # issues ONE async copy per page (~0.25 µs regardless of bytes), so
        # 128-token pages are issue-bound and cap int8-cache decode at
        # ~1.4× over bf16 where 256+ reaches the 1.7-1.9× bandwidth bound
        # (exp26 sweep, docs/perf_notes.md).  Callers with many short
        # sequences can drop back to 128 to halve page fragmentation.
        num_pages: int = 256,
        page_tokens: int = 256,
        max_batch: int = 8,
        max_pages_per_seq: Optional[int] = None,
        cache_dtype=jnp.bfloat16,
        chunk_size: Optional[int] = None,
        # False → float pages; True/8 → int8 K/V halves (2× capacity);
        # 4 → shared-byte int4 pages (4× capacity, K low nibble / V high
        # nibble — the reference's INT4 cache mode, README.md:291-296).
        quantized_cache=False,
        executor=None,
        # Decode iterations FUSED into one device dispatch per engine tick
        # (lax.scan with in-graph greedy sampling).  The per-dispatch host
        # cost on this runtime is ~0.5-2.7 ms — at long context it, not
        # the kernel, dominates single-token decode; fusing T steps
        # amortizes it T-fold.  EOS inside a fused block is honored
        # host-side (tokens past EOS are discarded; their over-reserved
        # pages free on completion).  1 = the classic per-token loop.
        decode_steps: int = 1,
    ):
        self.params = params
        self.cfg = cfg
        self.page_tokens = page_tokens
        self.max_batch = max_batch
        self.max_pages_per_seq = max_pages_per_seq or min(
            num_pages, 4096 // page_tokens
        )
        self.pool = PagePool(num_pages, page_tokens)
        # Prefill chunk size: every chunk pads to this, so the chunked
        # prefill path compiles exactly once.
        self.chunk_size = chunk_size or max(page_tokens, 256)
        self.sched = Scheduler(
            self.pool, max_batch, token_budget=self.chunk_size
        )
        self.ex = executor or _gqa_executor()
        self.cache = self.ex.init_cache(
            cfg, num_pages, page_tokens, cache_dtype,
            quantized=quantized_cache,
        )
        self.requests: Dict[int, GenerationRequest] = {}
        self.outputs: Dict[int, List[int]] = {}
        self._last_token: Dict[int, int] = {}
        self._lengths: Dict[int, int] = {}
        self.decode_steps = max(1, int(decode_steps))
        self.sched.set_decode_chunk(self.decode_steps)
        # Steady-state occupancy accounting (decode slots used / max_batch
        # per decode tick) — the serving bench's promised metric — plus
        # per-phase wall time (prefill vs decode) so long-context decode
        # rates are reportable separately from the prompt-build cost.
        self._occ_slots = 0
        self._occ_ticks = 0
        self._prefill_s = 0.0
        self._decode_s = 0.0
        self._decode_tokens = 0
        self._prefill_tokens = 0

        # Jitted programs come from a MODULE-LEVEL cache keyed on
        # (executor fns, cfg): per-instance jit wrappers would recompile
        # for every new engine (benchmarks build one engine per run).
        self._prefill_jit, self._decode_jit, self._decode_scan_jit = (
            _jitted_programs(
                self.ex.prefill_chunk, self.ex.decode_step, cfg
            )
        )

    def submit(self, req: GenerationRequest):
        self.requests[req.request_id] = req
        self.outputs[req.request_id] = []
        self.sched.submit(req.request_id, len(req.prompt), req.max_new_tokens)

    def _page_row(self, seq_handle: int) -> np.ndarray:
        row = np.full(self.max_pages_per_seq, self.cache.trash_page, np.int32)
        pages = self.pool.pages(seq_handle, self.max_pages_per_seq)
        row[: len(pages)] = pages
        return row

    def step(self) -> bool:
        """Run one scheduler step.  Returns False when fully drained."""
        items = self.sched.next_step()
        if not items:
            if self.sched.num_running > 0:
                # Should be unreachable: the scheduler preempts the
                # youngest runner (recompute policy) whenever every
                # running sequence is page-blocked, so an empty step
                # with runners means a scheduler invariant broke.
                raise RuntimeError(
                    "scheduler invariant violation: empty step with "
                    f"{self.sched.num_running} running sequences "
                    "(mid-stream page pressure should preempt)"
                )
            if self.sched.num_waiting == 0:
                return False
            raise RuntimeError(
                "scheduler stalled: waiting requests cannot be admitted "
                "(prompt larger than the page pool?)"
            )
        self._seq_of = getattr(self, "_seq_of", {})

        prefills = [i for i in items if i.kind == ScheduledItem.PREFILL]
        decodes = [i for i in items if i.kind == ScheduledItem.DECODE]

        import time as _time

        t_phase = _time.perf_counter()
        for it in prefills:
            req = self.requests[it.request_id]
            self._seq_of[it.request_id] = it.seq_handle
            # Token source is prompt + already-generated tokens: after a
            # mid-stream PREEMPTION (recompute policy) the scheduler
            # re-queues the request with its generated tokens folded into
            # the prompt length, and this re-prefill rebuilds their KV.
            full = req.prompt + self.outputs[it.request_id]
            # Pad the chunk to the fixed compile size; pad rows scatter into
            # unreserved slots (trash page) and are masked out of the loss
            # path by last_index.
            chunk = full[it.chunk_start : it.chunk_start + it.chunk_len]
            padded = np.zeros(self.chunk_size, np.int32)
            padded[: len(chunk)] = chunk
            page_row = jnp.asarray(self._page_row(it.seq_handle))
            logits, self.cache = self._prefill_jit(
                self.params,
                jnp.asarray(padded),
                jnp.asarray(it.chunk_start, jnp.int32),
                jnp.asarray(it.chunk_len - 1, jnp.int32),
                self.cache,
                page_row,
            )
            self._prefill_tokens += it.chunk_len
            if it.chunk_start + it.chunk_len == len(full):
                # Sequence caught up: the last position's logits yield
                # the next generated token.
                self._emit(it.request_id, int(jnp.argmax(logits)))
        if prefills:
            # Phase fence: a scalar READBACK — block_until_ready does not
            # synchronize on this runtime (utils/profiling.py); without it
            # queued prefill work would bleed into the decode phase's
            # clock.
            _ = float(jnp.asarray(logits).ravel()[0])
            self._prefill_s += _time.perf_counter() - t_phase
            t_phase = _time.perf_counter()

        if decodes:
            b = self.max_batch
            tokens = np.zeros(b, np.int32)
            lengths = np.ones(b, np.int32)
            pts = np.full(
                (b, self.max_pages_per_seq), self.cache.trash_page, np.int32
            )
            live = []
            for slot, it in enumerate(decodes[:b]):
                rid = it.request_id
                tokens[slot] = self._last_token[rid]
                # _lengths already counts the token being decoded (it was
                # emitted last step; its KV is appended during THIS step).
                lengths[slot] = self._lengths[rid]
                pts[slot] = self._page_row(it.seq_handle)
                live.append(rid)
            self._occ_slots += len(live)
            self._occ_ticks += 1
            # Fused tick: the common multi-token grant across the batch
            # (compiled once for decode_steps; smaller tail grants take
            # the single-step loop to avoid per-T recompiles).
            t_fused = min(
                (max(1, it.chunk_len) for it in decodes[:b]),
                default=1,
            )
            if t_fused >= self.decode_steps and self.decode_steps > 1:
                toks, self.cache = self._decode_scan_jit(
                    self.params,
                    jnp.asarray(tokens),
                    jnp.asarray(lengths),
                    jnp.asarray(pts),
                    self.cache,
                    n_steps=self.decode_steps,
                )
                toks = np.asarray(toks)  # [T, B]
                for slot, rid in enumerate(live):
                    for t in range(self.decode_steps):
                        if rid not in self.requests or self._done(rid):
                            break  # EOS/max inside the fused block
                        self._emit(rid, int(toks[t, slot]))
                        self._decode_tokens += 1
            else:
                logits, self.cache = self._decode_jit(
                    self.params,
                    jnp.asarray(tokens),
                    jnp.asarray(lengths),
                    jnp.asarray(pts),
                    self.cache,
                )
                nxt = np.asarray(jnp.argmax(logits, axis=-1))
                for slot, rid in enumerate(live):
                    self._emit(rid, int(nxt[slot]))
                    self._decode_tokens += 1
            # np.asarray above already forced the readback fence.
            self._decode_s += _time.perf_counter() - t_phase
        return True

    @property
    def stats(self) -> Dict[str, float]:
        """Per-phase wall time + steady-state occupancy (serving bench)."""
        return dict(
            prefill_s=round(self._prefill_s, 4),
            decode_s=round(self._decode_s, 4),
            prefill_tokens=self._prefill_tokens,
            decode_tokens=self._decode_tokens,
            decode_occupancy=round(self.decode_occupancy, 4),
        )

    def _done(self, rid: int) -> bool:
        req = self.requests[rid]
        out = self.outputs[rid]
        return len(out) >= req.max_new_tokens or (
            req.eos_token is not None and req.eos_token in out
        )

    @property
    def decode_occupancy(self) -> float:
        """Mean decode-slot occupancy (used slots / max_batch) over decode
        ticks so far — the steady-state batching metric."""
        if not self._occ_ticks:
            return 0.0
        return self._occ_slots / (self._occ_ticks * self.max_batch)

    def _emit(self, rid: int, token: int):
        req = self.requests[rid]
        self.outputs[rid].append(token)
        self._last_token[rid] = token
        self._lengths[rid] = len(req.prompt) + len(self.outputs[rid])
        done = token == req.eos_token or len(
            self.outputs[rid]
        ) >= req.max_new_tokens
        # The emitted token occupies a KV slot only once decoded; report to
        # the scheduler which tracks lengths + completion.
        self.sched.report_token(rid, finished=done)

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        for _ in range(max_steps):
            if not self.step():
                break
        return self.outputs
