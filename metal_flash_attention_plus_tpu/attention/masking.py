"""Masking specifications — TPU-native analog of the reference's sparsity zoo.

The reference supports (``Sources/FlashAttention/Attention/AttentionDescriptor.swift:17-75``):

- ``SparsityPattern``: none / causal / slidingWindow(windowSize) / custom blockMask
- ``SparseMaskDescriptor``: dense / sparseRanges (per-row uint2 [start,end)) /
  blockSparse(blockSize) with MQA metadata
- external additive bias masks bound as an extra device buffer
- a data-driven ``bitmask`` vs ``elementWise`` masking-strategy heuristic

TPU-first redesign: masks are *static metadata resolved at trace time* plus
small per-row range arrays delivered to the kernel via scalar prefetch.  The
kernel skips fully-masked KV blocks at grid level (splash-style block
skipping — the TPU-idiomatic replacement for Metal's per-element bitmask
strategy, SURVEY.md §7 step 4) and applies element-wise masking only on
diagonal/edge blocks.

Sliding-window semantics follow the reference's *centered* window
(``SparseMQABuilder.buildSlidingWindow``, ``SparseMQABuilder.swift:4-28``):
row ``i`` attends to ``[max(0, i - w//2), min(S, i + w//2))``.

Block-sparse semantics follow ``SparseMQABuilder.buildBlockSparse``
(``SparseMQABuilder.swift:30-62``): a boolean pattern over
``[num_row_blocks][num_col_blocks]`` is lowered to per-*row-block* column
ranges ``[first_active*bs, (last_active+1)*bs)``; rows with no active block
get the empty range ``[0, 0)``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# The reference masks with -0.875 * FLT_MAX (AttentionKernel+Softmax.swift:243-275);
# JAX's TPU kernels use -0.7 * float32.max for the same no-NaN reason.  Either
# sentinel avoids exp(-inf - (-inf)) NaNs; keep one canonical value.
DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


class MaskKind(enum.Enum):
    """Which structural sparsity pattern applies to the score matrix."""

    NONE = "none"
    CAUSAL = "causal"
    SLIDING_WINDOW = "sliding_window"
    SPARSE_RANGES = "sparse_ranges"
    BLOCK_SPARSE = "block_sparse"


@dataclasses.dataclass(frozen=True)
class MaskSpec:
    """Static description of the attention mask.

    Mirrors ``SparsityPattern`` + ``SparseMaskDescriptor``
    (``AttentionDescriptor.swift:17-75``) as one flat, hashable spec usable as
    a ``jax.jit`` static argument.

    Attributes:
      kind: structural pattern.
      window_size: total sliding-window size (centered, reference semantics).
      causal: for SLIDING_WINDOW, additionally intersect with the causal
        triangle (common LLM usage; the reference composes these via separate
        function constants).
      block_size: block size for BLOCK_SPARSE patterns.
      num_rows: row count for range-based masks (sparse ranges are data,
        carried separately as an ``[S, 2]`` int32 array).
    """

    kind: MaskKind = MaskKind.NONE
    window_size: Optional[int] = None
    causal: bool = False
    block_size: Optional[int] = None

    def __post_init__(self):
        if self.kind == MaskKind.SLIDING_WINDOW and not self.window_size:
            raise ValueError("SLIDING_WINDOW requires window_size >= 1")
        if self.kind == MaskKind.BLOCK_SPARSE and not self.block_size:
            raise ValueError("BLOCK_SPARSE requires block_size >= 1")

    @property
    def is_causal(self) -> bool:
        return self.kind == MaskKind.CAUSAL or (
            self.kind == MaskKind.SLIDING_WINDOW and self.causal
        )


CAUSAL = MaskSpec(kind=MaskKind.CAUSAL)
FULL = MaskSpec(kind=MaskKind.NONE)


def sliding_window(window_size: int, causal: bool = False) -> MaskSpec:
    return MaskSpec(
        kind=MaskKind.SLIDING_WINDOW, window_size=window_size, causal=causal
    )


def build_sliding_window_ranges(seq_len: int, window_size: int) -> np.ndarray:
    """Per-row [start, end) KV ranges for a centered sliding window.

    Parity with ``SparseMQABuilder.buildSlidingWindow``
    (``SparseMQABuilder.swift:4-28``): ``start = max(0, i - w//2)``,
    ``end = min(S, i + w//2)``.  Returns int32 ``[seq_len, 2]``.
    """
    w = max(1, int(window_size))
    half = w // 2
    rows = np.arange(seq_len)
    start = np.maximum(0, rows - half)
    end = np.minimum(seq_len, rows + half)
    return np.stack([start, end], axis=-1).astype(np.int32)


def build_block_sparse_ranges(
    pattern: np.ndarray, block_size: int
) -> np.ndarray:
    """Lower a boolean block pattern to per-row-block column ranges.

    Parity with ``SparseMQABuilder.buildBlockSparse``
    (``SparseMQABuilder.swift:30-62``).  ``pattern`` is
    ``[num_row_blocks, num_col_blocks]`` bool; returns int32
    ``[num_row_blocks, 2]`` element (not block) ranges; all-inactive rows get
    ``[0, 0)``.
    """
    pattern = np.asarray(pattern, dtype=bool)
    num_rows, num_cols = pattern.shape
    out = np.zeros((num_rows, 2), dtype=np.int32)
    for r in range(num_rows):
        active = np.nonzero(pattern[r])[0]
        if active.size:
            out[r, 0] = active[0] * block_size
            out[r, 1] = min((active[-1] + 1) * block_size, num_cols * block_size)
    return out


def build_segment_ranges(
    segment_ids, causal: bool = True
):
    """Per-row [start, end) KV ranges for PACKED SEQUENCES (document mask):
    row i attends only tokens of its own segment, optionally causally.

    ``segment_ids`` is int [S] (non-decreasing segment labels, the standard
    sequence-packing layout).  Accepts a traced jax array — the result
    feeds the kernels' DYNAMIC range path (bounds become scalar-prefetch
    data inside jit), so per-batch packing layouts need no recompilation.
    Returns int32 [S, 2] (jnp if input is jnp, else numpy).
    """
    xp = jnp if isinstance(segment_ids, jnp.ndarray) else np
    seg = xp.asarray(segment_ids)
    s = seg.shape[0]
    idx = xp.arange(s)
    is_start = xp.concatenate(
        [xp.ones((1,), bool), seg[1:] != seg[:-1]]
    )
    # start[i] = index of i's segment's first token (running max of starts)
    start = _cummax(xp, xp.where(is_start, idx, 0))
    if causal:
        end = idx + 1  # own position is always inside own segment
    else:
        # end[i] = the next segment's start index (S if none): suffix-min
        # of start positions, shifted one left.
        nxt = xp.where(is_start, idx, s)
        sm = _cummin_reverse(xp, nxt, s)
        end = xp.concatenate([sm[1:], xp.full((1,), s, sm.dtype)])
    out = xp.stack([start, end], axis=-1)
    return out.astype(xp.int32)


def _cummax(xp, x):
    if xp is np:
        return np.maximum.accumulate(x)
    return jax.lax.associative_scan(jnp.maximum, x)


def _cummin_reverse(xp, x, fill):
    if xp is np:
        return np.minimum.accumulate(x[::-1])[::-1]
    return jax.lax.associative_scan(jnp.minimum, x, reverse=True)


def expand_block_ranges_to_rows(
    block_ranges: np.ndarray, block_size: int, seq_len: int
) -> np.ndarray:
    """Expand per-row-block ranges to per-row ranges of length ``seq_len``."""
    rows = np.arange(seq_len) // block_size
    rows = np.minimum(rows, block_ranges.shape[0] - 1)
    return block_ranges[rows]


def materialize_mask(
    spec: MaskSpec,
    seq_q: int,
    seq_kv: int,
    ranges: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Dense boolean ``[seq_q, seq_kv]`` mask (True = attend).

    This is the golden-model materialization used by the pure-jnp reference
    layer and by tests; kernels never build this matrix (that is the whole
    point of flash attention).
    """
    rows = jnp.arange(seq_q)[:, None]
    cols = jnp.arange(seq_kv)[None, :]
    if spec.kind == MaskKind.NONE:
        return jnp.ones((seq_q, seq_kv), dtype=bool)
    if spec.kind == MaskKind.CAUSAL:
        # Rectangular causal aligns the *ends* of the sequences (decode
        # convention): query i attends to kv j where j <= i + (seq_kv - seq_q).
        return cols <= rows + (seq_kv - seq_q)
    if spec.kind == MaskKind.SLIDING_WINDOW:
        half = max(1, spec.window_size) // 2
        mask = (cols >= rows - half) & (cols < rows + half)
        if spec.causal:
            mask &= cols <= rows + (seq_kv - seq_q)
        return mask
    if spec.kind in (MaskKind.SPARSE_RANGES, MaskKind.BLOCK_SPARSE):
        if ranges is None:
            raise ValueError(f"{spec.kind} requires a ranges array")
        r = jnp.asarray(ranges)
        if spec.kind == MaskKind.BLOCK_SPARSE:
            # jnp (not np) so traced range arrays work under jit.
            row_blocks = jnp.minimum(
                jnp.arange(seq_q) // spec.block_size, r.shape[0] - 1
            )
            r = r[row_blocks]
        start = r[:, 0][:, None]
        end = r[:, 1][:, None]
        return (cols >= start) & (cols < end)
    raise NotImplementedError(spec.kind)
