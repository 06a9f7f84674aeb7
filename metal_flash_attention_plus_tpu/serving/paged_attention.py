"""Paged ragged-decode attention Pallas kernel.

New scope vs the reference (its serving story is "encode into the caller's
command buffer", ``MultiHeadAttention.swift:197-234``): single-token decode
over a PAGED KV cache — the attention pattern of continuous batching.  Each
sequence's KV lives in fixed-size pages scattered through one pool; a page
table maps (sequence, logical page) → physical page.  Per-sequence lengths
make the batch ragged.

Kernel shape: grid (B, Hkv, max_pages).  The page table and lengths arrive
via scalar prefetch; the K/V BlockSpec index maps translate logical page j
of sequence b into the physical page — CLAMPED to the sequence's last live
page, so steps past the end re-reference the same block and Pallas's
pipeline skips the re-fetch (dead pages cost neither HBM bandwidth nor DMA
latency; compute is skipped with ``pl.when``).  GQA: the q-head group of
each KV head rides in the sublane dimension of one tile.

The online-softmax accumulator math is the same (m, l, rescale) as the
prefill kernel — one numerics convention across the engine.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.inf


def _decode_kernel(
    # scalar prefetch
    pt_ref,  # [B, max_pages] physical page ids
    len_ref,  # [B] sequence lengths
    # tensors
    *refs,
    page_tokens: int,
    group_pad: int,
    head_dim: int,
    quantized: bool,
    v_tail_zero: int,
    precision,
):
    if quantized:
        (q_ref, k_ref, ks_ref, v_ref, vs_ref,
         o_ref, m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    b = pl.program_id(0)
    j = pl.program_id(2)
    length = len_ref[b]
    live = j * page_tokens < length
    last = jnp.logical_and(live, (j + 1) * page_tokens >= length)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]  # [group_pad, D] (pre-scaled)
        if quantized:
            k = (
                k_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
                * ks_ref[0, 0]
            ).astype(q.dtype)
        else:
            k = k_ref[0, 0]  # [page_tokens, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [group_pad, page_tokens]
        # Mask tokens past the sequence length within this page.
        col = jax.lax.broadcasted_iota(
            jnp.int32, (group_pad, page_tokens), 1
        ) + j * page_tokens
        s = jnp.where(col < length, s, NEG_INF)

        m_prev = m_scr[...][:, :1]
        l_prev = l_scr[...][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        # exp(-inf - -inf) guard: fully-masked groups keep m == -inf.
        alpha = jnp.where(
            jnp.isneginf(m_prev), 0.0, jnp.exp(m_prev - m_next)
        )
        p = jnp.exp(s - m_next)
        l_scr[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True),
            l_scr.shape,
        )
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)

        if quantized:
            v = (
                v_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
                * vs_ref[0, 0]
            ).astype(q.dtype)
        else:
            v = v_ref[0, 0]  # [page_tokens, D]
        if v_tail_zero:
            # MLA latent pages: K carries [c | k_rope] but V is the bare
            # latent — zero the rope tail so one page pool serves both.
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (page_tokens, head_dim), 1
            )
            v = jnp.where(lane < head_dim - v_tail_zero, v, 0)
        pv = jax.lax.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(last)
    def _store():
        lsum = l_scr[...][:, :1]
        safe = jnp.where(lsum == 0.0, 1.0, lsum)
        o_ref[0, 0] = (acc_scr[...] / safe).astype(o_ref.dtype)


def _prefill_kernel(
    # scalar prefetch
    pt_ref,  # [max_pages] physical page ids (one sequence)
    off_ref,  # [1] chunk's global start position
    # tensors
    *refs,
    page_tokens: int,
    rows_pad: int,
    chunk: int,
    head_dim: int,
    quantized: bool,
    v_tail_zero: int,
    precision,
):
    if quantized:
        (q_ref, k_ref, ks_ref, v_ref, vs_ref,
         o_ref, m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    j = pl.program_id(1)
    off = off_ref[0]
    total = off + chunk  # KV tokens visible to the last chunk row
    live = j * page_tokens < total
    last = jnp.logical_and(live, (j + 1) * page_tokens >= total)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(live)
    def _compute():
        q = q_ref[0]  # [rows_pad, D] pre-scaled
        if quantized:
            k = (
                k_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
                * ks_ref[0, 0]
            ).astype(q.dtype)
        else:
            k = k_ref[0, 0]  # [page_tokens, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # Causal in GLOBAL coordinates: row r (a group-major flattening of
        # (g, c)) is chunk position c = r mod chunk, global off + c; it sees
        # KV columns ≤ off + c.
        row = jax.lax.broadcasted_iota(
            jnp.int32, (rows_pad, page_tokens), 0
        ) % chunk
        col = jax.lax.broadcasted_iota(
            jnp.int32, (rows_pad, page_tokens), 1
        ) + j * page_tokens
        s = jnp.where(col <= off + row, s, NEG_INF)

        m_prev = m_scr[...][:, :1]
        l_prev = l_scr[...][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.where(
            jnp.isneginf(m_prev), 0.0, jnp.exp(m_prev - m_next)
        )
        p = jnp.where(
            jnp.isneginf(s), 0.0, jnp.exp(s - m_next)
        )
        l_scr[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True), l_scr.shape
        )
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        if quantized:
            v = (
                v_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
                * vs_ref[0, 0]
            ).astype(q.dtype)
        else:
            v = v_ref[0, 0]
        if v_tail_zero:
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (page_tokens, head_dim), 1
            )
            v = jnp.where(lane < head_dim - v_tail_zero, v, 0)
        pv = jax.lax.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(last)
    def _store():
        lsum = l_scr[...][:, :1]
        safe = jnp.where(lsum == 0.0, 1.0, lsum)
        o_ref[0] = (acc_scr[...] / safe).astype(o_ref.dtype)


def paged_prefill_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    page_row: jnp.ndarray,
    offset: jnp.ndarray,
    *,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    v_tail_zero: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Chunked-prefill attention for ONE sequence over its paged cache.

    The chunk's K/V must already be written to the pages (the caller
    scatters before attending, exactly like the decode path).  Causal
    masking runs in global coordinates, so the chunk attends to the whole
    cached prefix plus its own triangle.

    Args:
      q: [Hq, chunk, D] chunk queries (chunk is trace-time static).
      k_pages, v_pages: [Hkv, num_pages, page_tokens, D].
      page_row: [max_pages] int32 physical page ids for this sequence.
      offset: scalar int32 — the chunk's first global position.

    Returns [Hq, chunk, D] in q.dtype.
    """
    quantized = k_scales is not None
    hq, chunk, d = q.shape
    hkv, _n, page_tokens, dk = k_pages.shape
    assert dk == d and v_pages.shape == k_pages.shape and hq % hkv == 0
    group = hq // hkv
    max_pages = page_row.shape[0]
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    rows = group * chunk
    rows_pad = max(8, rows)
    qg = (q.astype(jnp.float32) * scale).astype(q.dtype)
    # [Hq, chunk, D] → [Hkv, group·chunk, D] group-major rows.
    qg = qg.reshape(hkv, rows, d)
    if rows_pad != rows:
        qg = jnp.pad(qg, ((0, 0), (0, rows_pad - rows), (0, 0)))

    def page_index(h, j, pt, off):
        last_page = jnp.maximum(off[0] + chunk - 1, 0) // page_tokens
        return (h, pt[jnp.minimum(j, last_page)], 0, 0)

    in_specs = [
        pl.BlockSpec((1, rows_pad, d), lambda h, j, pt, off: (h, 0, 0)),
        pl.BlockSpec((1, 1, page_tokens, d), page_index),
    ]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, page_tokens, 1), page_index))
    in_specs.append(pl.BlockSpec((1, 1, page_tokens, d), page_index))
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, page_tokens, 1), page_index))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hkv, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows_pad, d), lambda h, j, pt, off: (h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_pad, 128), jnp.float32),
            pltpu.VMEM((rows_pad, 128), jnp.float32),
            pltpu.VMEM((rows_pad, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel,
        page_tokens=page_tokens,
        rows_pad=rows_pad,
        chunk=chunk,
        head_dim=d,
        quantized=quantized,
        v_tail_zero=v_tail_zero,
        precision=(
            jax.lax.Precision.HIGHEST
            if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, rows_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        page_row.astype(jnp.int32),
        jnp.asarray(offset, jnp.int32).reshape(1),
        qg,
        *([k_pages, k_scales, v_pages, v_scales] if quantized
          else [k_pages, v_pages]),
    )
    return out[:, :rows, :].reshape(hq, chunk, d)


def paged_decode_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    v_tail_zero: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-token decode attention over a paged KV cache.

    Args:
      q: [B, Hq, D] current-step queries.
      k_pages, v_pages: [Hkv, num_pages, page_tokens, D] page pools.
      page_table: [B, max_pages_per_seq] int32 physical page ids (entries
        past a sequence's last page are ignored).
      lengths: [B] int32 — tokens currently in each sequence's cache
        (INCLUDING the token being decoded, which the caller has already
        appended; every length must be ≥ 1).
      k_scales, v_scales: [Hkv, num_pages, page_tokens, 1] per-token
        symmetric scales for int8 page pools (dequantized on tile load).

    Returns [B, Hq, D] in q.dtype.
    """
    quantized = k_scales is not None
    b, hq, d = q.shape
    hkv, _num_pages, page_tokens, dk = k_pages.shape
    assert dk == d and v_pages.shape == k_pages.shape
    assert hq % hkv == 0
    group = hq // hkv
    max_pages = page_table.shape[1]
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    group_pad = max(8, group)
    qg = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qg = qg.reshape(b, hkv, group, d)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    def page_index(bi, h, j, pt, ln):
        # Clamp to the last live page: dead steps re-reference the same
        # block, which the pipeline recognizes and skips re-fetching.
        last_page = jnp.maximum(ln[bi] - 1, 0) // page_tokens
        return (h, pt[bi, jnp.minimum(j, last_page)], 0, 0)

    in_specs = [
        pl.BlockSpec(
            (1, 1, group_pad, d), lambda bi, h, j, pt, ln: (bi, h, 0, 0)
        ),
        pl.BlockSpec((1, 1, page_tokens, d), page_index),
    ]
    inputs = [qg, k_pages]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, page_tokens, 1), page_index))
        inputs.append(k_scales)
    in_specs.append(pl.BlockSpec((1, 1, page_tokens, d), page_index))
    inputs.append(v_pages)
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, page_tokens, 1), page_index))
        inputs.append(v_scales)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, group_pad, d), lambda bi, h, j, pt, ln: (bi, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((group_pad, 128), jnp.float32),
            pltpu.VMEM((group_pad, 128), jnp.float32),
            pltpu.VMEM((group_pad, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        page_tokens=page_tokens,
        group_pad=group_pad,
        head_dim=d,
        quantized=quantized,
        v_tail_zero=v_tail_zero,
        precision=(
            jax.lax.Precision.HIGHEST
            if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), *inputs)
    return out[:, :, :group, :].reshape(b, hq, d)
