"""Fused flash-attention forward Pallas kernel (MXU-tiled, online softmax,
dense block grid with live-window skipping).

TPU-native redesign of the reference's generated forward kernel
(``AttentionKernel+Source.swift:372-416`` — parallelize over R, traverse C,
online softmax in registers, async-copied K/V tiles):

- Metal threadgroup-over-R grid      → Pallas grid (B, Hq, ni, nj_max): a
  DENSE rectangular grid over (q-block, kv-block) whose j extent is the
  widest live window.  The reference's whole mask zoo (causal /
  sliding-window / sparse row-ranges / block-sparse,
  ``AttentionKernel+Softmax.swift:278-634``) lowers to per-row [start, end)
  column ranges → per-q-block kv-block windows [lo, hi) in scalar prefetch.
  Dead steps skip compute via ``pl.when`` and clamp their index maps to the
  previous block (no DMA issued), costing ~26 µs each — measured CHEAPER
  than a flattened live-tile-only schedule, whose q-block transitions stall
  the pipeline ~185 µs each (docs/perf_notes.md, "Sparse-schedule fix").
- Masking is applied UNCONDITIONALLY on live tiles: builtin masks (causal /
  sliding window / padding) are affine in the row index and rebuilt
  in-kernel from iota + closure constants (no range-array input streams);
  only data-driven range masks stream per-row [start, end) tiles.  The
  fused iota/where mask pass is free; branching around it (``lax.cond``)
  spills the score tile and costs ~70 µs per affected tile.
- simdgroup async copies             → the Pallas pipeline double-buffers
  HBM→VMEM tile fetches automatically from the BlockSpec index maps.
- 13 Metal function constants        → Python closure constants; one
  compiled variant per static config.
- GQA/MQA broadcast happens in the K/V BlockSpec index maps
  (vs in-kernel ``kv_head_id`` arithmetic, ``AttentionKernel+Source.swift:84-87``).
- L (natural-log row logsumexp) is always computed and written, and O is
  fp32 in memory by default — both reference decisions kept deliberately
  (``AttentionDescriptor+Precisions.swift:127-143``).

Numerics: scores and softmax statistics in fp32 regardless of input dtype;
softmax stats (m, l) are kept lane-replicated [block_q, 128] and widened
with ``pltpu.repeat`` (cheap full-lane replication) rather than broadcast
from a 1-lane slice (a relayout) — worth ~5% of peak.  The softmax scale is
folded into Q once in the wrapper (one [Sq, D] pass) instead of per-tile.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_plus_tpu.attention.masking import (
    DEFAULT_MASK_VALUE,
    MaskKind,
    MaskSpec,
    FULL,
    expand_block_ranges_to_rows,
)

NEG_INF = -jnp.inf
LANES = 128


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Seq-tile sizes — the analog of the reference's per-device parameter
    tables (``AttentionDescriptor+Parameters.swift:74-292``), chosen by VMEM
    budget and VPU:MXU work ratio instead of register pressure.

    TWO-LEVEL KV tiling (round-2 rework, docs/perf_notes.md "Two-level"):
    ``block_kv`` is the INNER compute tile; ``block_kv_major`` (a multiple
    of it; 0 → equal, i.e. single-level) is the KV slab one grid step
    fetches and processes with an unrolled inner loop — Mosaic interleaves
    subtile t+1's QKᵀ (MXU) with subtile t's softmax (VPU), which one-tile
    bodies cannot do.  Measured +7-35%% on v5e at every head dim."""

    block_q: int = 512
    block_kv: int = 512
    block_kv_major: int = 0  # 0 → = block_kv (single-level)
    # Backward tiles (used by flash_attention_bwd kernels).  (512, 512)
    # measured best for both bwd kernels on v5e (docs/perf_notes.md).
    block_q_dkv: int = 512
    block_kv_dkv: int = 512
    block_q_dq: int = 512
    block_kv_dq: int = 512
    # Two-level majors for the backward kernels (0 → single-level): the dQ
    # kernel slabs its KV traversal, the dKV kernel its (group × Q) one.
    block_kv_dq_major: int = 0
    block_q_dkv_major: int = 0

    def __post_init__(self):
        majors = {
            "block_kv_major": self.block_kv,
            "block_kv_dq_major": self.block_kv_dq,
            "block_q_dkv_major": self.block_q_dkv,
        }
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name in majors:
                if v and v % majors[f.name] != 0:
                    raise ValueError(
                        f"{f.name}={v} must be a multiple of its inner tile"
                    )
                continue
            if v % 128 != 0:
                raise ValueError(f"{f.name}={v} must be a multiple of 128")

    @property
    def kv_major(self) -> int:
        return self.block_kv_major or self.block_kv

    @property
    def kv_dq_major(self) -> int:
        return self.block_kv_dq_major or self.block_kv_dq

    @property
    def q_dkv_major(self) -> int:
        return self.block_q_dkv_major or self.block_q_dkv


def _interpret_two_level() -> bool:
    import os

    return os.environ.get("MFA_INTERPRET_TWO_LEVEL") == "1"


def default_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode when the caller
    didn't say. True on the CPU backend; ``MFA_FORCE_INTERPRET=1`` overrides
    for runs that place work on CPU devices while another platform plugin
    remains the process default backend (e.g. the driver's virtual-CPU
    multichip dryrun under an active TPU tunnel)."""
    import os

    return (
        os.environ.get("MFA_FORCE_INTERPRET") == "1"
        or jax.default_backend() == "cpu"
    )


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def compute_row_ranges(
    mask: MaskSpec,
    seq_q: int,
    seq_kv: int,
    *,
    mask_ranges: Optional[np.ndarray] = None,
    seq_q_padded: Optional[int] = None,
    seq_kv_cap: Optional[int] = None,
) -> np.ndarray:
    """Lower any MaskSpec to per-row [start, end) KV column ranges.

    This is the key unification: every mask the reference supports is (or is
    lowered to, see ``SparseMQABuilder.swift``) a contiguous per-row column
    range.  Rows past ``seq_q`` (padding) get the empty range [0, 0).

    Returns int32 [seq_q_padded, 2].
    """
    sq_pad = seq_q_padded or seq_q
    cap = seq_kv_cap if seq_kv_cap is not None else seq_kv
    rows = np.arange(sq_pad)
    off = seq_kv - seq_q  # rectangular causal: ends aligned

    if mask.kind == MaskKind.NONE:
        start = np.zeros(sq_pad, np.int64)
        end = np.full(sq_pad, cap, np.int64)
    elif mask.kind == MaskKind.CAUSAL:
        start = np.zeros(sq_pad, np.int64)
        end = np.minimum(rows + off + 1, cap)
    elif mask.kind == MaskKind.SLIDING_WINDOW:
        half = max(1, mask.window_size) // 2
        start = np.maximum(0, rows - half)
        end = np.minimum(rows + half, cap)
        if mask.causal:
            end = np.minimum(end, rows + off + 1)
    elif mask.kind in (MaskKind.SPARSE_RANGES, MaskKind.BLOCK_SPARSE):
        if mask_ranges is None:
            raise ValueError(f"{mask.kind} requires mask_ranges")
        r = np.asarray(mask_ranges)
        if mask.kind == MaskKind.BLOCK_SPARSE:
            r = expand_block_ranges_to_rows(r, mask.block_size, seq_q)
        start = np.zeros(sq_pad, np.int64)
        end = np.zeros(sq_pad, np.int64)
        start[:seq_q] = r[:seq_q, 0]
        end[:seq_q] = np.minimum(r[:seq_q, 1], cap)
    else:
        raise NotImplementedError(mask.kind)

    if sq_pad > seq_q:
        start[seq_q:] = 0
        end[seq_q:] = 0
    end = np.maximum(end, start)
    return np.stack([start, end], axis=-1).astype(np.int32)


def build_block_bounds(
    row_ranges: np.ndarray, block_q: int, block_kv: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-q-block kv-block bounds for the dense (i, j) grid: int32 [ni]
    arrays (lo, hi, max_start, min_end).  [lo, hi) is the live kv-block
    window of q-block i; max_start/min_end are the all-rows-live bounds for
    the interior (skip-element-masking) test.  Empty q-blocks get lo==hi."""
    sq_pad = row_ranges.shape[0]
    ni = sq_pad // block_q
    start = row_ranges[:, 0].reshape(ni, block_q).astype(np.int64)
    end = row_ranges[:, 1].reshape(ni, block_q).astype(np.int64)
    live = end > start
    any_live = live.any(axis=1)
    all_live = live.all(axis=1)
    big = np.int64(np.iinfo(np.int32).max)
    start_masked = np.where(live, start, big)
    lo = np.where(any_live, start_masked.min(axis=1) // block_kv, 0)
    hi = np.where(any_live, -(-end.max(axis=1) // block_kv), 0)
    max_start = np.where(all_live, start.max(axis=1), big)
    min_end = np.where(all_live, end.min(axis=1), -1)
    return (
        lo.astype(np.int32),
        hi.astype(np.int32),
        max_start.astype(np.int32),
        min_end.astype(np.int32),
    )


def compute_row_ranges_dynamic(
    mask_ranges: jnp.ndarray,
    seq_q: int,
    seq_kv: int,
    seq_q_padded: int,
    seq_kv_cap: int,
) -> jnp.ndarray:
    """Traced counterpart of :func:`compute_row_ranges` for DYNAMIC sparse
    ranges (a jax array, e.g. derived from per-batch segment ids inside
    jit).  The reference's range buffers are likewise built at runtime per
    dispatch (``SparseMQABuilder.swift``).  Returns int32 [sq_padded, 2]."""
    r = mask_ranges.astype(jnp.int32)
    start = jnp.clip(r[:seq_q, 0], 0, seq_kv_cap)
    end = jnp.clip(r[:seq_q, 1], 0, seq_kv_cap)
    end = jnp.maximum(end, start)
    if seq_q_padded > seq_q:
        pad = ((0, seq_q_padded - seq_q),)
        start = jnp.pad(start, pad)
        end = jnp.pad(end, pad)
    return jnp.stack([start, end], axis=-1)


def build_block_bounds_dynamic(
    row_ranges: jnp.ndarray, block_q: int, block_kv: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Traced (lo, hi) per-q-block kv-block windows — the jnp counterpart
    of :func:`build_block_bounds` (no packing/interior stats: the dynamic
    path runs the full-width dense grid, bounds only gate compute/DMA)."""
    sq_pad = row_ranges.shape[0]
    ni = sq_pad // block_q
    start = row_ranges[:, 0].reshape(ni, block_q)
    end = row_ranges[:, 1].reshape(ni, block_q)
    live = end > start
    any_live = jnp.any(live, axis=1)
    big = jnp.int32(np.iinfo(np.int32).max)
    lo = jnp.where(
        any_live,
        jnp.min(jnp.where(live, start, big), axis=1) // block_kv,
        0,
    )
    hi = jnp.where(any_live, -(-jnp.max(end, axis=1) // block_kv), 0)
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def build_rowstat_bounds_dynamic(
    row_ranges: jnp.ndarray, block_q: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Traced all-rows-live [ms, me) per q-block: the slab-interior fast
    path's bounds (ms = max(start), me = min(end) when every row in the
    block is live; [INT32_MAX, -1) otherwise so no slab ever tests fully
    live)."""
    sq_pad = row_ranges.shape[0]
    ni = sq_pad // block_q
    st = row_ranges[:, 0].reshape(ni, block_q)
    en = row_ranges[:, 1].reshape(ni, block_q)
    all_live = jnp.all(en > st, axis=1)
    big32 = jnp.int32(np.iinfo(np.int32).max)
    ms = jnp.where(all_live, jnp.max(st, axis=1), big32)
    me = jnp.where(all_live, jnp.min(en, axis=1), jnp.int32(-1))
    return ms, me


def build_packed_schedule(lo: np.ndarray, hi: np.ndarray):
    """Fold ragged live windows into a dense grid by pairing q-blocks.

    For triangular schedules (causal) half the dense (i, j) grid steps are
    dead.  Pair the widest window with the narrowest (run sums are ~constant
    for causal: i+1 with ni-i), giving each grid row TWO contiguous
    segments — q-block q0 for the first n0 steps, q1 for the next — so one
    accumulator serves both (store + re-init at the segment boundary).
    Grid shrinks from ni × max(run) to ceil(ni/2) × max(pair sum): for
    causal exactly the live tiles, no dead steps.

    Returns int32 arrays (q0, q1, n0, t) of length R plus (R, W):
    q0/q1 = q-block ids of the row's segments (q1 == q0 when unpaired),
    n0 = steps of segment 0, t = total valid steps (t == n0 if unpaired),
    W = grid width.  Empty q-blocks still get one step (their store writes
    zeros / -inf L).
    """
    ni = len(lo)
    steps = np.maximum((hi - lo).astype(np.int64), 1)
    order = np.argsort(-steps, kind="stable")
    nrows = (ni + 1) // 2
    q0 = np.zeros(nrows, np.int32)
    q1 = np.zeros(nrows, np.int32)
    n0 = np.zeros(nrows, np.int32)
    t = np.zeros(nrows, np.int32)
    for r in range(nrows):
        a = int(order[r])
        q0[r] = a
        n0[r] = steps[a]
        bpos = ni - 1 - r
        if bpos > r:
            bidx = int(order[bpos])
            q1[r] = bidx
            t[r] = steps[a] + steps[bidx]
        else:
            q1[r] = a
            t[r] = steps[a]
    return q0, q1, n0, t, nrows, int(t.max())


def build_flat_schedule(
    lo: np.ndarray, hi: np.ndarray, b: int, hq: int
):
    """Flatten (b, h, q-block, live kv-major) into ONE grid dimension.

    Per-step int32 tables drive the kernel and the BlockSpec index maps:
    (bof, hof, qof, kvof) are the batch / head / q-block / kv-major of
    step j; ``flags`` packs init (bit 0, first step of a q-block segment),
    store (bit 1, last step) and live (bit 2).  Empty q-blocks get one
    non-live step (store writes zeros / -inf L) whose kvof repeats the
    previous step's so no KV fetch is issued.

    Why flat: exp13/exp14 (docs/perf_notes.md round-2 addendum) measured a
    large fixed cost per GRID ROW (pipeline restart) that short ragged
    rows never amortize — neither the mask pass nor the packed-pair
    machinery.  One row per dispatch pays it once.
    """
    ni = len(lo)
    runs = np.maximum(hi - lo, 0).astype(np.int64)
    steps_per_bh = int(np.maximum(runs, 1).sum())
    t_total = b * hq * steps_per_bh
    bof = np.empty(t_total, np.int32)
    hof = np.empty(t_total, np.int32)
    qof = np.empty(t_total, np.int32)
    kvof = np.empty(t_total, np.int32)
    flags = np.empty(t_total, np.int32)
    # Per-(b,h) segment pattern is identical; build once and tile.
    q1 = np.empty(steps_per_bh, np.int32)
    kv1 = np.empty(steps_per_bh, np.int32)
    fl1 = np.empty(steps_per_bh, np.int32)
    p = 0
    prev_kv = 0
    for i in range(ni):
        r = int(runs[i])
        if r == 0:
            q1[p] = i
            kv1[p] = prev_kv  # repeat: no fetch for the dead step
            fl1[p] = 1 | 2  # init + store, not live
            p += 1
            continue
        for jj in range(r):
            q1[p] = i
            kv1[p] = int(lo[i]) + jj
            fl1[p] = (1 if jj == 0 else 0) | (2 if jj == r - 1 else 0) | 4
            p += 1
        prev_kv = int(hi[i]) - 1
    assert p == steps_per_bh
    for bi in range(b):
        for h in range(hq):
            s = (bi * hq + h) * steps_per_bh
            e = s + steps_per_bh
            bof[s:e] = bi
            hof[s:e] = h
            qof[s:e] = q1
            kvof[s:e] = kv1
            flags[s:e] = fl1
    return bof, hof, qof, kvof, flags, t_total


def plan_wavefront_parts(runs: np.ndarray, max_parts: int = 4):
    """Split q-blocks into contiguous parts with similar live-window widths.

    A part's grid j extent is its own max run, so ragged schedules (causal:
    runs 1..ni) stop paying max-width dead steps on narrow q-blocks (a dead
    step costs ~0.5 live tiles, docs/perf_notes.md).  Greedy contiguous
    split: cut whenever the accumulated dead-step count within the current
    part exceeds a quarter of its live steps, up to ``max_parts``.
    Returns [(i0, i1), ...] covering [0, len(runs)).
    """
    ni = len(runs)
    if ni <= 1:
        return [(0, ni)]
    total_live = int(runs.sum())
    total_dead = int((runs.max() * ni) - total_live) if ni else 0
    # Engage only under EXTREME raggedness (dead > 2× live, e.g. a
    # block-sparse mask where a few q-blocks have huge windows): part-level
    # pipeline restarts measurably outweigh moderate dead-step counts
    # (causal measured FASTER unsplit — docs/perf_notes.md).
    if total_dead <= 2 * max(1, total_live):
        return [(0, ni)]
    # Equal split by cumulative live work (balances part sizes for causal).
    parts = []
    csum = np.concatenate([[0], np.cumsum(runs)])
    n_parts = min(max_parts, ni)
    targets = [total_live * (p + 1) / n_parts for p in range(n_parts)]
    i0 = 0
    for tgt in targets:
        i1 = int(np.searchsorted(csum, tgt, side="left"))
        i1 = max(i0 + 1, min(i1, ni))
        parts.append((i0, i1))
        i0 = i1
        if i0 >= ni:
            break
    if parts and parts[-1][1] < ni:
        parts[-1] = (parts[-1][0], ni)
    return parts


def resolve_mask_mode(mask: MaskSpec, has_mask: bool, sq: int, skv: int):
    """Pick the kernel masking mode + affine coefficients.

    Affine masks (start = max(0, row + A), end = min(cap, row + B), rows ≥
    seq_q dead) cover NONE (padding-only) / CAUSAL / SLIDING_WINDOW exactly
    — no per-step range-array input streams.  Data-driven masks
    (SPARSE_RANGES / BLOCK_SPARSE) fall back to streamed rs/re tiles.
    """
    off = skv - sq
    big = 1 << 30
    if not has_mask:
        return "none", (0, 0, 0, 0)
    if mask.kind in (MaskKind.NONE, MaskKind.CAUSAL):
        b_off = off + 1 if mask.kind == MaskKind.CAUSAL else big
        return "affine", (-big, b_off, sq, skv)
    if mask.kind == MaskKind.SLIDING_WINDOW:
        half = max(1, mask.window_size) // 2
        b_off = min(half, off + 1) if mask.causal else half
        return "affine", (-half, b_off, sq, skv)
    return "ranges", (0, 0, 0, 0)


LOG2E = float(np.log2(np.e))
LN2 = float(np.log(2.0))

# row_max="estimate": C − SLACK (base-2 units) is the floor of the softmax
# subtrahend when the sampled estimate is far below the Cauchy–Schwarz
# bound C.  64 exponent units keep exp2 comfortably inside fp32 range in
# both directions (overflow needs a score 64 above the bound — impossible;
# underflow needs the true max 60+ units below C, where probabilities are
# subnormal-adjacent but ratios stay exact).
ROW_MAX_SLACK = 64.0


def estimate_row_max_scaled(
    q_scaled: jnp.ndarray,
    k: jnp.ndarray,
    mask: MaskSpec,
    *,
    row_ranges=None,
    kv_head_of,
    seq_q: int,
    seq_kv: int,
    num_samples: int = 128,
) -> jnp.ndarray:
    """Per-row softmax subtrahend M for the static-max kernels (base-2).

    The running online max exists to keep exp2 in range — it is NOT needed
    for correctness: softmax is invariant to ANY per-row constant shift, and
    fp32/bf16 carry relative precision at every exponent.  The backward
    kernels already exploit this (p = exp(s − L) with L a per-row constant,
    ``flash_attention_bwd.py``) and run FASTER per FLOP than forward; this
    gives the forward the same freedom — no per-tile max reduction, no
    alpha rescale, no loop-carried serialization between the two MXU dots.
    (docs/perf_notes.md "static-max".)

    M = max(m_est, C − ROW_MAX_SLACK), where m_est is the row max over
    ``num_samples`` strided sample columns (mask-aware — one thin
    [Sq, nc, D] matmul, ~nc/Skv of the kernel's FLOPs) and C the row-wise
    Cauchy–Schwarz bound |q_r|·max_c|k_c| — a TRUE upper bound, so exp2
    never overflows; the sampled term keeps probabilities near unity for
    typical score fields (the max of a few-thousand-column row exceeds a
    128-column sample by ~one score-std).

    Args are in kernel units: ``q_scaled`` already folded with
    scale·log2(e); ``k`` float (dequantized for the quantized path).
    Returns fp32 [B, Hq, Sq].
    """
    b, hq, sq, d = q_scaled.shape
    _, hkv, skv, _ = k.shape
    qf = q_scaled.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    head_map = np.asarray([kv_head_of(h) for h in range(hq)])
    # Cauchy–Schwarz upper bound per row.
    knorm_max = jnp.max(
        jnp.sqrt(jnp.sum(kf * kf, axis=-1)), axis=-1
    )  # [B, Hkv]
    qnorm = jnp.sqrt(jnp.sum(qf * qf, axis=-1))  # [B, Hq, Sq]
    cbound = qnorm * knorm_max[:, head_map][:, :, None]
    # Sampled row max (mask-aware).  Column 0 is always included: for
    # causal/padding masks it is live for every live row.
    cols = np.unique(
        np.linspace(0, max(skv - 1, 0), num_samples).astype(np.int64)
    )
    ks = kf[:, head_map][:, :, cols, :]  # [B, Hq, nc, D]
    s_smp = jnp.einsum("bhrd,bhcd->bhrc", qf, ks)
    colv = jnp.asarray(cols, jnp.int32)
    rows = jnp.arange(sq, dtype=jnp.int32)
    if row_ranges is not None:
        rr = row_ranges
        if isinstance(rr, np.ndarray):
            rr = jnp.asarray(rr)
        rs = rr[:sq, 0][:, None]
        re = rr[:sq, 1][:, None]
        keep = jnp.logical_and(colv[None, :] >= rs, colv[None, :] < re)
    elif mask.kind == MaskKind.CAUSAL:
        off = seq_kv - seq_q
        keep = colv[None, :] <= rows[:, None] + off
    elif mask.kind == MaskKind.SLIDING_WINDOW:
        half = max(1, mask.window_size) // 2
        lo = rows[:, None] - half
        hi = rows[:, None] + half
        if mask.causal:
            hi = jnp.minimum(hi, rows[:, None] + (seq_kv - seq_q))
        keep = jnp.logical_and(colv[None, :] >= lo, colv[None, :] < hi)
    else:
        keep = jnp.ones((sq, len(cols)), bool)
    m_est = jnp.max(
        jnp.where(keep[None, None], s_smp, -jnp.inf), axis=-1
    )
    return jnp.maximum(m_est, cbound - ROW_MAX_SLACK)


def _fwd_kernel(
    # scalar prefetch: (lo, hi, loi, hii) per q-block (major + inner
    # granularity); packed prepends (q0, q1, n0, t)
    *all_refs,
    block_q: int,
    block_kv: int,  # INNER compute tile
    n_inner: int,  # subtiles per grid step (major = n_inner * block_kv)
    head_dim: int,
    dv: int,  # V tile width (= round_up(d, 128) in ones mode)
    mask_mode: str,  # "none" | "affine" | "ranges"
    affine: Tuple[int, int, int, int],  # (A, B, seq_q, cap): see wrapper
    row_base: int,  # global row of this dispatch's first q-block (wavefront)
    has_rowstats: bool,  # ranges mode: (ms, me) all-rows-live prefetch arrays
    has_bias: bool,
    mask_value: float,
    precision,
    inner_skip: bool = False,
    ones: bool = False,
    packed: bool = False,
    flat: bool = False,
    lean: bool = False,  # dense grid, no scalar prefetch (FULL/no-mask)
    skip_row_guard: bool = False,  # every row statically live: skip store guard
    static_max: bool = False,  # per-row M input replaces the running max
):
    # TWO-LEVEL schedule (round-2 rework, docs/perf_notes.md): each grid
    # step owns a MAJOR KV slab and runs an unrolled inner loop over
    # ``n_inner`` compute tiles — the unroll lets Mosaic overlap subtile
    # t+1's QKᵀ (MXU) with subtile t's softmax (VPU), which the previous
    # one-tile-per-step body serialized.  Dead grid steps still skip via
    # `pl.when` + clamped index maps; ragged windows additionally skip dead
    # INNER subtiles against the inner-granularity bounds (``inner_skip``).
    #
    # ``ones`` (d % 128 != 0): V is padded to ``dv`` lanes with ONES — the
    # PV dot then produces rowsum(p) in the spare lanes for free (the MXU
    # pads to 128 lanes anyway), eliminating the separate l sum-reduce VPU
    # pass AND the [:, :1] lane-broadcast relayouts of the d<128 path.
    # Measured +25-35% at d=64.
    #
    # Softmax runs in BASE 2 (log2(e) folded into the Q pre-scale; exp2
    # on the VPU; L converted back to natural log at store).
    has_mask = mask_mode != "none"
    if lean:
        # LEAN dense schedule (round-4, exp33): for UNMASKED problems the
        # live window is the whole row — no scalar-prefetch tables, no
        # live/dead logic, plain program-id arithmetic everywhere, and a
        # reciprocal-multiply epilogue.  Measured +7% over the flat
        # schedule at FULL d=256 (175.2 vs 163.9 TF/s within-run,
        # docs/perf_notes.md round 4); for masked problems the flat
        # schedule stays (the lean dense causal grid measured SLOWER —
        # dead steps + per-row restarts cost more than the tables).
        refs = all_refs
        row_block = pl.program_id(2)
        j = pl.program_id(3)
        jj = j
        live = None  # statically live
        init_cond = j == 0
        store_cond = j == pl.num_programs(3) - 1
        kvj = j
        loi = hii = None
    elif flat:
        # FLAT segment schedule (round-2): the ENTIRE (b, h, q-block,
        # live kv-major) iteration space is one arbitrary grid dimension
        # driven by per-step int32 tables — zero dead steps AND zero grid-
        # row restarts.  exp13/exp14 measured the per-row pipeline restart
        # (not masking, not packing) as the whole causal-vs-full gap; a
        # single grid row amortizes it once per dispatch instead of once
        # per (b, h, q-block): causal fwd d128 61→85, d256 63→97 TF/s.
        # flags bit 0 = init (first step of a segment), bit 1 = store
        # (last step), bit 2 = live (0 only for empty q-blocks, whose one
        # step just stores zeros / -inf L).
        (bof_ref, hof_ref, qof_ref, kvof_ref, flags_ref,
         loi_ref, hii_ref) = all_refs[:7]
        refs = all_refs[7:]
        if has_rowstats:
            ms_ref, me_ref = refs[0], refs[1]
            refs = refs[2:]
        j = pl.program_id(0)
        fl = flags_ref[j]
        row_block = qof_ref[j]
        live = (fl & 4) != 0
        init_cond = (fl & 1) != 0
        store_cond = (fl & 2) != 0
        kvj = kvof_ref[j]
        loi = loi_ref[row_block]
        hii = hii_ref[row_block]
    elif packed:
        # Packed-pair schedule: grid row r = two contiguous segments
        # (q-blocks q0, q1).  Steps past t are padding: index maps clamp,
        # nothing initializes/computes/stores.
        (q0_ref, q1_ref, n0_ref, t_ref,
         lo_ref, hi_ref, loi_ref, hii_ref) = all_refs[:8]
        refs = all_refs[8:]
        if has_rowstats:
            ms_ref, me_ref = refs[0], refs[1]
            refs = refs[2:]
        r = pl.program_id(2)
        j = pl.program_id(3)
        n0 = n0_ref[r]
        seg1 = jnp.logical_and(j >= n0, t_ref[r] > n0)
        row_block = jnp.where(seg1, q1_ref[r], q0_ref[r])
        jj = j - jnp.where(seg1, n0, 0)
        lo = lo_ref[row_block]
        run = hi_ref[row_block] - lo
        valid = j < t_ref[r]
        live = jnp.logical_and(valid, jj < run)
        init_cond = jnp.logical_or(
            j == 0,
            jnp.logical_and(seg1, jnp.logical_and(jj == 0, valid)),
        )
        store_cond = jnp.logical_and(valid, jj == jnp.maximum(run, 1) - 1)
    else:
        lo_ref, hi_ref, loi_ref, hii_ref = all_refs[:4]
        refs = all_refs[4:]
        row_block = pl.program_id(2)
        j = pl.program_id(3)
        jj = j
        lo = lo_ref[row_block]
        run = hi_ref[row_block] - lo
        live = j < run
        init_cond = j == 0
        store_cond = j == jnp.maximum(run, 1) - 1
        if has_rowstats:
            ms_ref, me_ref = refs[0], refs[1]
            refs = refs[2:]
    if mask_mode == "ranges":
        rs_ref, re_ref = refs[0], refs[1]
        refs = refs[2:]
    if static_max:
        mx_ref = refs[0]  # [1, 1, bq, 1] per-row subtrahend (base-2)
        refs = refs[1:]
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    refs = refs[3:]
    if has_bias:
        bias_ref = refs[0]
        refs = refs[1:]
    if ones:
        o_ref, l_ref, m_scr, acc_scr = refs
        l_scr = None
    else:
        o_ref, l_ref, m_scr, l_scr, acc_scr = refs

    if not flat and not lean:
        kvj = lo + jj  # major kv block index
        loi = loi_ref[row_block]
        hii = hii_ref[row_block]

    @pl.when(init_cond)
    def _init():
        if static_max:
            # The per-row subtrahend is a CONSTANT for the whole q-block:
            # one lane-broadcast per block, zero per-tile stat work.
            m_scr[...] = jnp.broadcast_to(
                mx_ref[0, 0], (block_q, LANES)
            )
        else:
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        if not ones:
            l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _inner(t, masked):
        q = q_ref[0, 0]  # [bq, D] (pre-scaled by scale·log2e)
        k = k_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        inner_idx = kvj * n_inner + t
        if has_bias:
            # Scores are in the log2 domain (scale·log2e folded into Q);
            # the additive bias must be converted too.
            s += bias_ref[
                0, 0, :, pl.ds(t * block_kv, block_kv)
            ].astype(jnp.float32) * LOG2E
        if masked:
            # Masking is applied UNCONDITIONALLY on live tiles: the fused
            # iota/where pass is free, while branching around it spills the
            # score tile (~70 µs/tile) — docs/perf_notes.md.
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + inner_idx * block_kv
            )
            if mask_mode == "affine":
                a_off, b_off, seq_q, cap = affine
                row = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_kv), 0
                    )
                    + row_base + row_block * block_q
                )
                keep = jnp.logical_and(
                    col >= jnp.maximum(0, row + a_off),
                    col < jnp.minimum(cap, row + b_off),
                )
                keep = jnp.logical_and(keep, row < seq_q)
            else:
                keep = jnp.logical_and(col >= rs_ref[...], col < re_ref[...])
            s = jnp.where(keep, s, mask_value)

        if static_max:
            # Static-max softmax: M is a per-row constant (host-estimated
            # true-bound blend, see estimate_row_max_scaled) — no per-tile
            # max reduction, no alpha rescale, and no loop-carried VPU
            # dependency between subtiles (acc/l are pure += chains the
            # compiler can pipeline against the MXU dots).  This is the
            # forward analog of the backward's p = exp(s − L).
            p = jnp.exp2(
                s - pltpu.repeat(m_scr[...], block_kv // LANES, axis=1)
            )
            v = v_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
            pv = jax.lax.dot(
                p.astype(v.dtype), v,
                preferred_element_type=jnp.float32, precision=precision,
            )
            if not ones:
                l_scr[...] = l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
            acc_scr[...] = acc_scr[...] + pv
            return

        m_prev = m_scr[...]  # [bq, 128] lane-replicated
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # [bq, 128]
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - pltpu.repeat(m_next, block_kv // LANES, axis=1))
        m_scr[...] = m_next

        v = v_ref[0, 0, pl.ds(t * block_kv, block_kv), :]  # [bkv, dv]
        pv = jax.lax.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=precision,
        )
        if ones:
            a_wide = (
                alpha if dv == LANES
                else pltpu.repeat(alpha, dv // LANES, axis=1)
            )
            acc_scr[...] = acc_scr[...] * a_wide + pv
        else:
            l_scr[...] = (
                alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
            )
            if head_dim == LANES:
                acc_scr[...] = acc_scr[...] * alpha + pv
            elif head_dim % LANES == 0:
                acc_scr[...] = (
                    acc_scr[...]
                    * pltpu.repeat(alpha, head_dim // LANES, axis=1)
                    + pv
                )
            else:
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    def _loop(masked, guards=True):
        for t in range(n_inner):
            if guards and inner_skip and n_inner > 1:
                g = kvj * n_inner + t

                @pl.when(jnp.logical_and(g >= loi, g < hii))
                def _(t=t):
                    _inner(t, masked)
            else:
                _inner(t, masked)

    if lean:
        # Every step statically live — no branch at all.
        _loop(False, guards=False)

    elif not has_mask:

        @pl.when(live)
        def _compute():
            _loop(False)

    elif flat:
        # FLAT mode uses a SINGLE always-masked body: two alternative
        # bodies behind pl.when break the single-row pipeline's steady
        # state (measured: flat causal d256 88→63 TF/s with the dual
        # path), while the fused iota/compare/select mask pass itself is
        # free (exp13: causal-nomask ≡ causal).  Dead inner subtiles are
        # masked to -inf and contribute exp2(-big)=0 — correct without
        # per-subtile guards; the dispatcher keeps capacity waste low by
        # choosing majors that hug the mask (inner_skip tables unused).

        @pl.when(live)
        def _compute_flat():
            _loop(True, guards=False)

    else:
        # Splash-style dual path (splash_attention_kernel.py's
        # should_not_mask branch): a KV slab provably INSIDE the mask skips
        # the per-element mask pass entirely — for causal only the ~1
        # diagonal slab per q-block pays the iota/compare/select VPU work,
        # the interior ~ni/2 slabs run at FULL-mask per-tile rate.
        c0 = kvj * (n_inner * block_kv)
        c1 = c0 + n_inner * block_kv
        r0 = row_base + row_block * block_q
        r1 = r0 + block_q
        if mask_mode == "affine":
            a_off, b_off, seq_q, cap = affine
            fully_live = jnp.logical_and(
                jnp.logical_and(c1 <= r0 + b_off, c0 >= r1 - 1 + a_off),
                jnp.logical_and(r1 <= seq_q, c1 <= cap),
            )
        else:
            # keep = rs <= col < re per row; the slab is fully live iff
            # every row is live (encoded ms=INT_MAX/me=-1 otherwise) and
            # [c0, c1) ⊆ [max(rs), min(re)) = [ms, me).
            fully_live = jnp.logical_and(
                c0 >= ms_ref[row_block], c1 <= me_ref[row_block]
            )

        @pl.when(jnp.logical_and(live, fully_live))
        def _compute_interior():
            # Inside the mask every inner subtile is live too — the
            # per-subtile inner-skip guards are dead code here.
            _loop(False, guards=False)

        @pl.when(jnp.logical_and(live, jnp.logical_not(fully_live)))
        def _compute_edge():
            _loop(True)

    @pl.when(store_cond)
    def _store():
        if ones:
            acc = acc_scr[...]
            lsum_w = acc[:, head_dim:]  # [bq, dv - d] replicated rowsums
            lsum = lsum_w[:, :1]
            safe1 = jnp.where(lsum == 0.0, 1.0, lsum)
            if dv - head_dim >= head_dim:
                denom = jnp.where(
                    lsum_w[:, :head_dim] == 0.0, 1.0,
                    lsum_w[:, :head_dim],
                )
            else:
                denom = safe1
            out = acc[:, :head_dim] / denom
            m1 = m_scr[...][:, :1]
            lse1 = jnp.where(
                lsum > 0.0, m1 * LN2 + jnp.log(safe1), NEG_INF
            )
            lse = jnp.broadcast_to(lse1, (block_q, LANES))
        else:
            lsum = l_scr[...]  # [bq, 128]
            safe = jnp.where(lsum == 0.0, 1.0, lsum)
            if lean:
                # Reciprocal-multiply epilogue (one VPU recip on the
                # lane-replicated [bq, 128] stats, multiplies across D).
                inv = 1.0 / safe
                if head_dim % LANES == 0:
                    out = acc_scr[...] * (
                        inv if head_dim == LANES
                        else pltpu.repeat(inv, head_dim // LANES, axis=1)
                    )
                else:
                    out = acc_scr[...] * inv[:, :1]
            elif head_dim == LANES:
                out = acc_scr[...] / safe
            elif head_dim % LANES == 0:
                out = acc_scr[...] / pltpu.repeat(
                    safe, head_dim // LANES, axis=1
                )
            else:
                out = acc_scr[...] / safe[:, :1]
            m = m_scr[...]
            lse = jnp.where(
                lsum > 0.0, m * LN2 + jnp.log(safe), NEG_INF
            )
        if has_mask and not skip_row_guard:
            # Rows whose whole range is empty self-accumulate the uniform
            # exp(0) garbage of the sentinel trick; zero them explicitly.
            # Skipped when the schedule proves every row live (causal/full:
            # saves 2-3 VPU passes per q-row store).
            if mask_mode == "affine":
                a_off, b_off, seq_q, cap = affine
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    + row_base + row_block * block_q
                )
                live_rows = jnp.logical_and(
                    row < seq_q,
                    jnp.minimum(cap, row + b_off)
                    > jnp.maximum(0, row + a_off),
                )
            else:
                live_rows = re_ref[...] > rs_ref[...]  # [bq, 1]
            out = jnp.where(live_rows, out, 0.0)
            lse = jnp.where(live_rows, lse, NEG_INF)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        l_ref[0, 0] = lse

    # L is written lane-replicated [block_q, 128] (layout [B, H, Sq, 128])
    # to avoid a sublane->lane relayout at every q-block transition; the
    # wrapper slices lane 0.  Same decision as the reference always writing
    # L (MultiHeadAttention.swift:295-319) — cheap, kills a bug class.


def flash_attention_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: MaskSpec = FULL,
    mask_ranges: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
    out_dtype: jnp.dtype = jnp.float32,
    row_max=None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flash attention forward.

    Args:
      q: [B, Hq, Sq, D] (bf16 or fp32).
      k, v: [B, Hkv, Skv, D].
      mask/mask_ranges/bias: see ``reference_attention`` — identical semantics.
      block_sizes: seq tiling (clamped to the padded problem size).
      out_dtype: O memory dtype (fp32 by default, reference policy).
      row_max: static-max softmax (see ``estimate_row_max_scaled``):
        ``"estimate"`` computes the per-row subtrahend on the host (one thin
        sampled matmul); or a caller-provided fp32 [B, Hq, Sq] of per-row
        score bounds in NATURAL logit units (scale·q·k).  Softmax is shift-
        invariant and fp32/bf16 carry relative precision at any exponent,
        so results match the running-max kernel to roundoff as long as the
        true row max stays within ~±60 base-2 units of the subtrahend
        (guaranteed by "estimate"'s Cauchy–Schwarz floor).  Incompatible
        with ``bias``.

    Returns:
      (o [B, Hq, Sq, D] out_dtype, l [B, Hq, Sq] fp32 natural logsumexp).
    """
    b, hq, sq, d = q.shape
    _, hkv, skv, dk2 = k.shape
    assert d == dk2 and v.shape == k.shape
    assert hq % hkv == 0
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        interpret = default_interpret()

    bq = min(block_sizes.block_q, _round_up(sq, 128))
    bkv = min(block_sizes.block_kv, _round_up(skv, 128))
    # Two-level KV tiling: a grid step fetches a MAJOR slab of n_inner
    # inner tiles (BlockSizes docstring; measured wins in perf_notes.md).
    bkv_major = min(
        max(block_sizes.kv_major, bkv), _round_up(skv, bkv)
    )
    bkv_major -= bkv_major % bkv
    if interpret and not _interpret_two_level():
        # Interpret mode executes the unrolled inner loop as traced Python —
        # the MXU/VPU overlap the unroll exists for does not apply, and the
        # trace/compile cost scales with n_inner.  Keep CPU runs single-level
        # (MFA_INTERPRET_TWO_LEVEL=1 overrides, for structure tests).
        bkv_major = bkv
    n_inner = bkv_major // bkv
    if n_inner >= 8 and d % LANES == 0 and not interpret:
        # Known Mosaic compiler crash (HTTP 500 from tpu_compile_helper,
        # not a Python exception): "mega-body" grid steps — ≥8 unrolled
        # inner KV subtiles — blow up the Mosaic lowering for every
        # non-ones configuration at d ≥ 128 (docs/perf_notes.md round-2
        # "two-level"; COVERAGE.md known gaps).  The block tables avoid
        # this geometry, but a user passing explicit BlockSizes would get
        # an opaque runtime RPC failure — reject with an actionable error
        # instead (same treatment as the r4 dequant-unroll guard in
        # quantized_attention).
        raise ValueError(
            f"flash forward with block_kv_major/block_kv = {n_inner} >= 8 "
            f"at head_dim {d} (a lane multiple) crashes the Mosaic "
            "compiler on TPU (known toolchain bug); use block_kv_major "
            f"<= 4*block_kv — e.g. BlockSizes(block_kv={bkv}, "
            f"block_kv_major={4 * bkv})"
        )
    sq_p = _round_up(sq, bq)
    skv_p = _round_up(skv, bkv_major)

    # Fold the softmax scale into Q once (fp32 accumulate, then back to the
    # input dtype) — together with log2(e): the kernel softmax runs in
    # base 2 (exp2) and converts L back to natural log at store.
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    # ones-fused rowsum (kernel docstring): for d % 128 != 0 pad V to the
    # next lane multiple with ONES — the PV dot emits rowsum(p) in the
    # spare lanes for free and the separate l pass disappears.
    ones = (d % LANES) != 0
    dv = _round_up(d, LANES) if ones else d

    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    if ones:
        v = jnp.concatenate(
            [v, jnp.ones((b, hkv, skv_p, dv - d), v.dtype)], axis=-1
        )
    if bias is not None:
        pb = [
            (0, 0),
            (0, 0),
            (0, sq_p - bias.shape[2]),
            (0, skv_p - bias.shape[3]),
        ]
        bias = jnp.pad(bias, pb)

    has_mask = mask.kind != MaskKind.NONE or skv_p != skv or sq_p != sq
    use_flat = not os.environ.get("MFA_NO_FLAT")
    # DYNAMIC ranges (a traced jax array, e.g. segment/document masks built
    # inside jit): bounds become traced scalar-prefetch data gating
    # compute/DMA over a full-width grid (grid shapes must stay static).
    dynamic = isinstance(mask_ranges, jnp.ndarray) and not isinstance(
        mask_ranges, np.ndarray
    )
    if dynamic:
        if mask.kind != MaskKind.SPARSE_RANGES:
            raise ValueError(
                "traced mask_ranges require MaskKind.SPARSE_RANGES"
            )
        row_ranges = compute_row_ranges_dynamic(
            mask_ranges, sq, skv, sq_p, skv
        )
        lo_arr, hi_arr = build_block_bounds_dynamic(
            row_ranges, bq, bkv_major
        )
        loi_arr, hii_arr = build_block_bounds_dynamic(row_ranges, bq, bkv)
        mask_mode, affine = "ranges", (0, 0, 0, 0)
        # All-rows-live [ms, me) per q-block for the interior fast path.
        ms_arr, me_arr = build_rowstat_bounds_dynamic(row_ranges, bq)
    else:
        row_ranges = compute_row_ranges(
            mask,
            sq,
            skv,
            mask_ranges=mask_ranges,
            seq_q_padded=sq_p,
            seq_kv_cap=skv,
        )
        lo_arr, hi_arr, ms_arr, me_arr = build_block_bounds(
            row_ranges, bq, bkv_major
        )
        loi_arr, hii_arr, _, _ = build_block_bounds(row_ranges, bq, bkv)
        mask_mode, affine = resolve_mask_mode(mask, has_mask, sq, skv)
        if use_flat and has_mask:
            # FLAT mode computes every inner subtile of a live major (the
            # single always-masked body has no per-subtile guards — dead
            # subtiles are masked to zero).  Shrink the major until the
            # capacity waste is ≤15% so the wasted MXU work stays small
            # (e.g. causal d128 bq=512: M2048 wastes 33%, M1024 10%).
            livei = int((hii_arr - loi_arr).sum())
            while bkv_major > bkv:
                cap = int((hi_arr - lo_arr).sum()) * (bkv_major // bkv)
                if cap <= 1.15 * max(1, livei):
                    break
                bkv_major //= 2
                lo_arr, hi_arr, ms_arr, me_arr = build_block_bounds(
                    row_ranges, bq, bkv_major
                )
            n_inner = bkv_major // bkv
    # Every row statically live (causal, full, most windows) → the store's
    # empty-row where-guards are dead code; skip them.
    all_live = (
        not dynamic
        and sq_p == sq
        and bool((row_ranges[:, 1] > row_ranges[:, 0]).all())
    )
    # Inner-subtile skipping only pays when the major-granularity window
    # over-covers the inner-granularity one (e.g. causal with block_q <
    # block_kv_major); when every inner tile of every live major is live,
    # the per-subtile `pl.when` is pure branch overhead (measured ~15% at
    # d=256) — disable it.
    if dynamic:
        inner_skip = has_mask and n_inner > 1
    else:
        _cap = int((hi_arr - lo_arr).sum()) * n_inner
        _livei = int((hii_arr - loi_arr).sum())
        inner_skip = (
            has_mask and n_inner > 1
            and (_cap - _livei) > 0.05 * max(1, _livei)
        )
    ni = sq_p // bq
    nj_all = skv_p // bkv_major  # grid width is in MAJOR blocks
    q_per_kv = hq // hkv

    def kv_head(h):
        return (h % hkv) if interleaved_kv else (h // q_per_kv)

    static_max = row_max is not None
    if static_max:
        if bias is not None:
            raise ValueError("row_max is incompatible with bias")
        if isinstance(row_max, str):
            if row_max != "estimate":
                raise ValueError(f"row_max: {row_max!r}")
            mx = estimate_row_max_scaled(
                q[:, :, :sq, :],
                k[:, :, :skv, :],
                mask,
                row_ranges=(
                    row_ranges if mask_mode == "ranges" else None
                ),
                kv_head_of=kv_head,
                seq_q=sq,
                seq_kv=skv,
            )
        else:
            mx = row_max.astype(jnp.float32) * LOG2E
        if sq_p != sq:
            mx = jnp.pad(mx, ((0, 0), (0, 0), (0, sq_p - sq)))
        mx4 = mx[..., None]  # [B, Hq, Sq_p, 1]

    precision = (
        # FP32 pipelines need true-fp32 MXU passes to hit the 2e-5 gate;
        # bf16 inputs use the native bf16 MXU path.
        jax.lax.Precision.HIGHEST
        if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def run_part(i0: int, i1: int):
        """One pallas dispatch over q-blocks [i0, i1) with a j extent sized
        to THIS part's widest live window."""
        ni_part = i1 - i0
        lo_part = lo_arr[i0:i1]
        hi_part = hi_arr[i0:i1]
        if dynamic:
            nj_max = nj_all  # traced bounds: conservative static width
        else:
            nj_max = max(1, int((hi_part - lo_part).max()))
        row0 = i0 * bq

        def kv_block(i, j, lo, hi):
            # Clamp dead steps to the window's last live block: the index
            # map repeats, so the pipeline skips the fetch.
            run = hi[i] - lo[i]
            return jnp.clip(lo[i] + jnp.minimum(j, run - 1), 0, nj_all - 1)

        in_specs = []
        inputs = []
        if mask_mode == "ranges":
            in_specs += [
                pl.BlockSpec(
                    (bq, 1), lambda bi, h, i, j, *r: (i0 + i, 0)
                ),
                pl.BlockSpec(
                    (bq, 1), lambda bi, h, i, j, *r: (i0 + i, 0)
                ),
            ]
            inputs += [
                jnp.asarray(row_ranges[:, 0:1]),
                jnp.asarray(row_ranges[:, 1:2]),
            ]
        if static_max:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, bq, 1),
                    lambda bi, h, i, j, *r: (bi, h, i0 + i, 0),
                )
            )
            inputs.append(mx4)
        in_specs += [
            pl.BlockSpec(
                (1, 1, bq, d), lambda bi, h, i, j, *r: (bi, h, i0 + i, 0)
            ),
            pl.BlockSpec(
                (1, 1, bkv_major, d),
                lambda bi, h, i, j, lo, hi, *r: (
                    bi, kv_head(h), kv_block(i, j, lo, hi), 0
                ),
            ),
            pl.BlockSpec(
                (1, 1, bkv_major, dv),
                lambda bi, h, i, j, lo, hi, *r: (
                    bi, kv_head(h), kv_block(i, j, lo, hi), 0
                ),
            ),
        ]
        inputs += [q, k, v]
        if bias is not None:
            bias_batch_bcast = bias.shape[0] == 1
            bias_head_bcast = bias.shape[1] == 1

            def bias_map(bi, h, i, j, lo, hi, *r):
                return (
                    0 if bias_batch_bcast else bi,
                    0 if bias_head_bcast else h,
                    i0 + i,
                    kv_block(i, j, lo, hi),
                )

            in_specs.append(pl.BlockSpec((1, 1, bq, bkv_major), bias_map))
            inputs.append(bias)

        kernel = functools.partial(
            _fwd_kernel,
            block_q=bq,
            block_kv=bkv,
            n_inner=n_inner,
            head_dim=d,
            dv=dv,
            mask_mode=mask_mode,
            # Affine row offsets are absolute; shift the kernel's i by i0
            # via the seq/row constants staying global — the kernel indexes
            # rows as i*block_q with i local, so fold i0 into the iota by
            # adjusting the prefetch-side row base below (row_base kwarg).
            affine=affine,
            row_base=row0,
            has_rowstats=mask_mode == "ranges",
            has_bias=bias is not None,
            mask_value=mask_value,
            precision=precision,
            inner_skip=inner_skip,
            ones=ones,
            skip_row_guard=all_live,
            static_max=static_max,
        )

        out_shape = [
            jax.ShapeDtypeStruct((b, hq, ni_part * bq, d), out_dtype),
            jax.ShapeDtypeStruct((b, hq, ni_part * bq, LANES), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec(
                (1, 1, bq, d), lambda bi, h, i, j, *r: (bi, h, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, bq, LANES), lambda bi, h, i, j, *r: (bi, h, i, 0)
            ),
        ]

        scratch = [pltpu.VMEM((bq, LANES), jnp.float32)]  # m
        if not ones:
            scratch.append(pltpu.VMEM((bq, LANES), jnp.float32))  # l
        scratch.append(
            pltpu.VMEM((bq, dv if ones else d), jnp.float32)  # acc
        )
        n_prefetch = 4 + (2 if mask_mode == "ranges" else 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(b, hq, ni_part, nj_max),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )

        if dynamic:
            live_tiles = ni_part * nj_all  # traced bounds: assume dense
        else:
            live_tiles = max(1, int((hi_part - lo_part).sum()))
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "arbitrary", "arbitrary"
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * hq * live_tiles * bq * bkv_major * d,
                bytes_accessed=(q.size + k.size + v.size)
                * q.dtype.itemsize,
                transcendentals=b * hq * live_tiles * bq * bkv_major,
            ),
            interpret=interpret,
        )(
            jnp.asarray(lo_part),
            jnp.asarray(hi_part),
            jnp.asarray(loi_arr[i0:i1]),
            jnp.asarray(hii_arr[i0:i1]),
            *(
                [jnp.asarray(ms_arr[i0:i1]), jnp.asarray(me_arr[i0:i1])]
                if mask_mode == "ranges"
                else []
            ),
            *inputs,
        )

    def run_packed():
        """Single dispatch over the packed-pair schedule: grid
        (B, Hq, R, W) where each row holds two contiguous q-block segments
        — zero dead steps for causal (build_packed_schedule)."""
        q0a, q1a, n0a, ta, nrows, width = build_packed_schedule(
            lo_arr, hi_arr
        )

        def seg1_of(r, j, n0, t):
            # Unpaired rows have t == n0: padding steps stay in segment 0
            # and clamp at its last tile (no index restarts, no re-fetch).
            return jnp.logical_and(j >= n0[r], t[r] > n0[r])

        def qi_of(r, j, q0, q1, n0, t):
            return jnp.where(seg1_of(r, j, n0, t), q1[r], q0[r])

        def kv_block_p(r, j, q0, q1, n0, t, lo, hi):
            qi = qi_of(r, j, q0, q1, n0, t)
            jj = j - jnp.where(seg1_of(r, j, n0, t), n0[r], 0)
            run = hi[qi] - lo[qi]
            return jnp.clip(lo[qi] + jnp.minimum(jj, run - 1), 0, nj_all - 1)

        in_specs = []
        inputs = []
        if mask_mode == "ranges":
            rspec = pl.BlockSpec(
                (bq, 1),
                lambda bi, h, r, j, q0, q1, n0, t, *rest: (
                    qi_of(r, j, q0, q1, n0, t), 0
                ),
            )
            in_specs += [rspec, rspec]
            inputs += [
                jnp.asarray(row_ranges[:, 0:1]),
                jnp.asarray(row_ranges[:, 1:2]),
            ]
        q_map = lambda bi, h, r, j, q0, q1, n0, t, *rest: (
            bi, h, qi_of(r, j, q0, q1, n0, t), 0
        )
        kv_map = lambda bi, h, r, j, q0, q1, n0, t, lo, hi, *rest: (
            bi, kv_head(h), kv_block_p(r, j, q0, q1, n0, t, lo, hi), 0
        )
        if static_max:
            in_specs.append(pl.BlockSpec((1, 1, bq, 1), q_map))
            inputs.append(mx4)
        in_specs += [
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bkv_major, d), kv_map),
            pl.BlockSpec((1, 1, bkv_major, dv), kv_map),
        ]
        inputs += [q, k, v]
        if bias is not None:
            bb = bias.shape[0] == 1
            bh = bias.shape[1] == 1
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, bq, bkv_major),
                    lambda bi, h, r, j, q0, q1, n0, t, lo, hi, *rest: (
                        0 if bb else bi,
                        0 if bh else h,
                        qi_of(r, j, q0, q1, n0, t),
                        kv_block_p(r, j, q0, q1, n0, t, lo, hi),
                    ),
                )
            )
            inputs.append(bias)

        kernel = functools.partial(
            _fwd_kernel,
            block_q=bq, block_kv=bkv, n_inner=n_inner, head_dim=d, dv=dv,
            mask_mode=mask_mode, affine=affine, row_base=0,
            has_rowstats=mask_mode == "ranges",
            has_bias=bias is not None, mask_value=mask_value,
            precision=precision, inner_skip=inner_skip, ones=ones,
            packed=True, skip_row_guard=all_live, static_max=static_max,
        )
        out_shape = [
            jax.ShapeDtypeStruct((b, hq, sq_p, d), out_dtype),
            jax.ShapeDtypeStruct((b, hq, sq_p, LANES), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bq, LANES), q_map),
        ]
        scratch = [pltpu.VMEM((bq, LANES), jnp.float32)]  # m
        if not ones:
            scratch.append(pltpu.VMEM((bq, LANES), jnp.float32))  # l
        scratch.append(
            pltpu.VMEM((bq, dv if ones else d), jnp.float32)  # acc
        )
        n_prefetch = 8 + (2 if mask_mode == "ranges" else 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(b, hq, nrows, width),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        live_tiles = max(1, int((hi_arr - lo_arr).sum()))
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "arbitrary", "arbitrary"
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * hq * live_tiles * bq * bkv_major * d,
                bytes_accessed=(q.size + k.size + v.size)
                * q.dtype.itemsize,
                transcendentals=b * hq * live_tiles * bq * bkv_major,
            ),
            interpret=interpret,
        )(
            jnp.asarray(q0a), jnp.asarray(q1a), jnp.asarray(n0a),
            jnp.asarray(ta), jnp.asarray(lo_arr), jnp.asarray(hi_arr),
            jnp.asarray(loi_arr), jnp.asarray(hii_arr),
            *(
                [jnp.asarray(ms_arr), jnp.asarray(me_arr)]
                if mask_mode == "ranges"
                else []
            ),
            *inputs,
        )

    def run_flat():
        """Single dispatch over the FLAT segment schedule: grid (T,) where
        T enumerates every (b, h, q-block, live kv-major) step — zero dead
        steps AND a single grid row for the whole problem (no per-row
        pipeline restarts: exp13/exp14, docs/perf_notes.md round-2)."""
        bofa, hofa, qofa, kvofa, flagsa, t_total = build_flat_schedule(
            lo_arr, hi_arr, b, hq
        )

        q_map = lambda j, bof, hof, qof, kvof, flags, *rest: (
            bof[j], hof[j], qof[j], 0
        )
        if interleaved_kv:
            kv_map = lambda j, bof, hof, qof, kvof, flags, *rest: (
                bof[j], hof[j] % hkv, kvof[j], 0
            )
        else:
            kv_map = lambda j, bof, hof, qof, kvof, flags, *rest: (
                bof[j] , hof[j] // q_per_kv, kvof[j], 0
            )

        in_specs = []
        inputs = []
        if mask_mode == "ranges":
            rspec = pl.BlockSpec(
                (bq, 1),
                lambda j, bof, hof, qof, kvof, flags, *rest: (qof[j], 0),
            )
            in_specs += [rspec, rspec]
            inputs += [
                jnp.asarray(row_ranges[:, 0:1]),
                jnp.asarray(row_ranges[:, 1:2]),
            ]
        if static_max:
            in_specs.append(pl.BlockSpec((1, 1, bq, 1), q_map))
            inputs.append(mx4)
        in_specs += [
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bkv_major, d), kv_map),
            pl.BlockSpec((1, 1, bkv_major, dv), kv_map),
        ]
        inputs += [q, k, v]
        if bias is not None:
            bb = bias.shape[0] == 1
            bh = bias.shape[1] == 1
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, bq, bkv_major),
                    lambda j, bof, hof, qof, kvof, flags, *rest: (
                        0 if bb else bof[j],
                        0 if bh else hof[j],
                        qof[j],
                        kvof[j],
                    ),
                )
            )
            inputs.append(bias)

        kernel = functools.partial(
            _fwd_kernel,
            block_q=bq, block_kv=bkv, n_inner=n_inner, head_dim=d, dv=dv,
            mask_mode=mask_mode, affine=affine, row_base=0,
            has_rowstats=mask_mode == "ranges",
            has_bias=bias is not None, mask_value=mask_value,
            precision=precision, inner_skip=inner_skip, ones=ones,
            flat=True, skip_row_guard=all_live, static_max=static_max,
        )
        out_shape = [
            jax.ShapeDtypeStruct((b, hq, sq_p, d), out_dtype),
            jax.ShapeDtypeStruct((b, hq, sq_p, LANES), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bq, LANES), q_map),
        ]
        scratch = [pltpu.VMEM((bq, LANES), jnp.float32)]  # m
        if not ones:
            scratch.append(pltpu.VMEM((bq, LANES), jnp.float32))  # l
        scratch.append(
            pltpu.VMEM((bq, dv if ones else d), jnp.float32)  # acc
        )
        n_prefetch = 7 + (2 if mask_mode == "ranges" else 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(t_total,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        live_tiles = max(1, int((hi_arr - lo_arr).sum()))
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * hq * live_tiles * bq * bkv_major * d,
                bytes_accessed=(q.size + k.size + v.size)
                * q.dtype.itemsize,
                transcendentals=b * hq * live_tiles * bq * bkv_major,
            ),
            interpret=interpret,
        )(
            jnp.asarray(bofa), jnp.asarray(hofa), jnp.asarray(qofa),
            jnp.asarray(kvofa), jnp.asarray(flagsa),
            jnp.asarray(loi_arr), jnp.asarray(hii_arr),
            *(
                [jnp.asarray(ms_arr), jnp.asarray(me_arr)]
                if mask_mode == "ranges"
                else []
            ),
            *inputs,
        )

    def run_lean():
        """LEAN dense dispatch for UNMASKED problems: grid (B, Hq, ni,
        nj), plain arithmetic index maps, zero scalar prefetch, and a
        reciprocal-multiply epilogue.  Measured +7% over the flat
        schedule at FULL d=256 (exp33, docs/perf_notes.md round 4)."""
        nj = skv_p // bkv_major
        q_map = lambda bi, h, i, j: (bi, h, i, 0)
        kv_map = lambda bi, h, i, j: (bi, kv_head(h), j, 0)
        in_specs = []
        inputs = []
        if static_max:
            in_specs.append(pl.BlockSpec((1, 1, bq, 1), q_map))
            inputs.append(mx4)
        in_specs += [
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bkv_major, d), kv_map),
            pl.BlockSpec((1, 1, bkv_major, dv), kv_map),
        ]
        inputs += [q, k, v]
        if bias is not None:
            bb = bias.shape[0] == 1
            bh = bias.shape[1] == 1
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, bq, bkv_major),
                    lambda bi, h, i, j: (
                        0 if bb else bi, 0 if bh else h, i, j
                    ),
                )
            )
            inputs.append(bias)
        kernel = functools.partial(
            _fwd_kernel,
            block_q=bq, block_kv=bkv, n_inner=n_inner, head_dim=d, dv=dv,
            mask_mode="none", affine=affine, row_base=0,
            has_rowstats=False, has_bias=bias is not None,
            mask_value=mask_value, precision=precision, inner_skip=False,
            ones=ones, lean=True, skip_row_guard=True,
            static_max=static_max,
        )
        out_shape = [
            jax.ShapeDtypeStruct((b, hq, sq_p, d), out_dtype),
            jax.ShapeDtypeStruct((b, hq, sq_p, LANES), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bq, LANES), q_map),
        ]
        scratch = [pltpu.VMEM((bq, LANES), jnp.float32)]  # m
        if not ones:
            scratch.append(pltpu.VMEM((bq, LANES), jnp.float32))  # l
        scratch.append(
            pltpu.VMEM((bq, dv if ones else d), jnp.float32)  # acc
        )
        return pl.pallas_call(
            kernel,
            grid=(b, hq, ni, nj),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "arbitrary", "arbitrary"
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * hq * ni * nj * bq * bkv_major * d,
                bytes_accessed=(q.size + k.size + v.size)
                * q.dtype.itemsize,
                transcendentals=b * hq * ni * nj * bq * bkv_major,
            ),
            interpret=interpret,
        )(*inputs)

    # Schedule choice for ragged live windows (causal: runs 1..ni):
    # 0. LEAN dense schedule for UNMASKED static problems (no prefetch,
    #    reciprocal epilogue) unless disabled via MFA_NO_LEAN=1.
    # 0b. FLAT single-row schedule for every other static-bounds problem
    #    (exact live tiles, one pipeline warm-up per dispatch) unless
    #    disabled via MFA_NO_FLAT=1.
    # 1. Packed-pair grid when it removes ≥10% of grid steps (causal: ~2×
    #    fewer; measured ~+20-30% — docs/perf_notes.md).
    # 2. Otherwise the dense grid, with wavefront partitioning only under
    #    extreme raggedness (dead > 2× live).
    if not dynamic and not has_mask and not os.environ.get("MFA_NO_LEAN"):
        o, l = run_lean()
        return o[:, :, :sq, :], l[:, :, :sq, 0]

    if dynamic:
        # Traced bounds: one full-width dense dispatch (no host packing).
        o, l = run_part(0, ni)
        return o[:, :, :sq, :], l[:, :, :sq, 0]

    if use_flat:
        o, l = run_flat()
        return o[:, :, :sq, :], l[:, :, :sq, 0]

    runs = (hi_arr - lo_arr).astype(np.int64)
    nj_dense = max(1, int(runs.max()))
    _q0, _q1, _n0, _t, _R, _W = build_packed_schedule(lo_arr, hi_arr)
    if ni > 1 and _R * _W < 0.9 * ni * nj_dense:
        o, l = run_packed()
        o = o[:, :, :sq, :]
        l = l[:, :, :sq, 0]
        return o, l

    parts = plan_wavefront_parts(runs)
    outs = [run_part(i0, i1) for i0, i1 in parts]
    if len(outs) == 1:
        o, l = outs[0]
    else:
        o = jnp.concatenate([p[0] for p in outs], axis=2)
        l = jnp.concatenate([p[1] for p in outs], axis=2)

    o = o[:, :, :sq, :]
    l = l[:, :, :sq, 0]
    return o, l


# ---------------------------------------------------------------------------
# Differentiable public API (custom_vjp)
# ---------------------------------------------------------------------------
#
# The reference wires backward as two encoder passes sharing the forward's
# residuals (MultiHeadAttention.swift:574-707).  The TPU analog is a
# jax.custom_vjp whose bwd invokes the dQ and dK/dV Pallas kernels
# (ops/flash_attention_bwd.py).  Gradients flow to q, k, v and (if given)
# the additive bias mask; mask_ranges is integer data (no gradient).
# Differentiating through the logsumexp output is not supported — use
# flash_attention_with_lse (l is stop_gradient'ed).


def _resolve(q, scale, out_dtype):
    scale_f = float(q.shape[-1]) ** -0.5 if scale is None else float(scale)
    return scale_f, (q.dtype if out_dtype is None else out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_attention(
    q, k, v, bias, mask_ranges,
    mask, scale, block_sizes, interleaved_kv, mask_value, out_dtype, interpret,
):
    # Returns (o, l) in ONE forward — flash_attention slices o, while
    # flash_attention_with_lse keeps both (no second dispatch; the l output
    # carries no gradient — its cotangent is discarded in _flash_attention_bwd).
    scale_f, odt = _resolve(q, scale, out_dtype)
    o, l = flash_attention_forward(
        q, k, v, mask=mask, mask_ranges=mask_ranges, bias=bias,
        scale=scale_f, block_sizes=block_sizes, interleaved_kv=interleaved_kv,
        mask_value=mask_value, out_dtype=jnp.float32, interpret=interpret,
    )
    return o.astype(odt), l


def _flash_attention_fwd(
    q, k, v, bias, mask_ranges,
    mask, scale, block_sizes, interleaved_kv, mask_value, out_dtype, interpret,
):
    scale_f, odt = _resolve(q, scale, out_dtype)
    o, l = flash_attention_forward(
        q, k, v, mask=mask, mask_ranges=mask_ranges, bias=bias,
        scale=scale_f, block_sizes=block_sizes, interleaved_kv=interleaved_kv,
        mask_value=mask_value, out_dtype=jnp.float32, interpret=interpret,
    )
    return (o.astype(odt), l), (q, k, v, bias, mask_ranges, o, l)


def _flash_attention_bwd(
    mask, scale, block_sizes, interleaved_kv, mask_value, out_dtype, interpret,
    res, cotangents,
):
    from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
        flash_attention_backward,
    )

    do, _dl = cotangents  # the logsumexp output carries no gradient path
    q, k, v, bias, mask_ranges, o, l = res
    scale_f, _ = _resolve(q, scale, out_dtype)
    dq, dk, dv, dbias = flash_attention_backward(
        q, k, v, o, l, do,
        mask=mask, mask_ranges=mask_ranges, bias=bias, scale=scale_f,
        block_sizes=block_sizes, interleaved_kv=interleaved_kv,
        interpret=interpret, compute_dbias=bias is not None,
    )
    dmr = (
        None
        if mask_ranges is None
        else np.zeros(mask_ranges.shape, jax.dtypes.float0)
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        None if bias is None else dbias.astype(bias.dtype),
        dmr,
    )


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask_ranges: Optional[jnp.ndarray] = None,
    *,
    mask: MaskSpec = FULL,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
    out_dtype: Optional[jnp.dtype] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable flash attention; returns O in ``out_dtype``
    (defaults to q.dtype).  Gradients: dq/dk/dv and dbias if bias given."""
    o, _ = _flash_attention(
        q, k, v, bias, mask_ranges,
        mask, scale, block_sizes, interleaved_kv, mask_value, out_dtype,
        interpret,
    )
    return o


def flash_attention_with_lse(
    q, k, v, bias=None, mask_ranges=None, *,
    mask=FULL, scale=None, block_sizes=BlockSizes(), interleaved_kv=False,
    mask_value=DEFAULT_MASK_VALUE, out_dtype=None, interpret=None,
):
    """Forward returning (o, stop_gradient(l)) — the always-written L of the
    reference, exposed without a gradient path.  Shares ONE forward dispatch
    with the differentiable path (the l output of the custom_vjp)."""
    o, l = _flash_attention(
        q, k, v, bias, mask_ranges,
        mask, scale, block_sizes, interleaved_kv, mask_value, out_dtype,
        interpret,
    )
    return o, jax.lax.stop_gradient(l)
