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


def _unpack_kv4_low(byte):
    """K half of an int4 shared-byte payload → int8 in [-8, 7].

    The pool packs K in the low nibble and V in the high nibble of ONE
    byte per (token, d) — see ``serving.kv_cache`` — so one page DMA
    feeds BOTH dots at a quarter of bf16's bytes (the reference's int4
    dequantizing load, ``GEMMHeaders.swift:740-808``).  Nibble math
    widens to int32 (8-bit vector arithmetic does not lower on Mosaic)
    and casts back down for the mixed int8 MXU dot."""
    wide = byte.astype(jnp.int32)
    return ((wide & 0xF) - 8).astype(jnp.int8)


def _unpack_kv4_high(byte):
    """V half (high nibble) of an int4 shared-byte payload.

    SPLIT layout (exp41): the pool stores V's signed value ``<< 4``, so
    one arithmetic right shift on the sign-extended byte recovers it —
    no mask, no offset (1.14× over the offset-offset unpack in the
    decode-shaped microbench; the V half becomes FREE relative to the
    int8 path's load)."""
    wide = byte.astype(jnp.int32)
    return (wide >> 4).astype(jnp.int8)


DECODE_CHUNK_PAGES = 8  # pages gathered per DMA wave
DECODE_SLOTS = 4  # waves in flight (page copies are LATENCY-bound: ~0.6-1.7
#                   us/copy single-stream; depth hides it)


def _decode_kernel(
    # scalar prefetch
    pt_ref,  # [B, max_pages] physical page ids
    len_ref,  # [B] sequence lengths
    # tensors
    *refs,
    page_tokens: int,
    chunk_pages: int,
    max_pages: int,
    group_pad: int,
    head_dim: int,
    s_sub: int,
    quantized: bool,
    kv_bits: int,
    v_tail_zero: int,
    precision,
):
    # Decode is BANDWIDTH-bound (one query row vs the whole cache), and
    # pages are scattered — BlockSpec streaming can only fetch ONE page per
    # grid step, which is DMA-latency-bound (measured ~100 GB/s).  Instead
    # the page pools stay in HBM (`pl.ANY`) and the kernel gathers
    # ``chunk_pages`` pages per wave with manual double-buffered async
    # copies (the DMA engine overlaps the whole wave), computing on the
    # previous wave meanwhile — the stock paged kernel's
    # MultiPageAsyncCopyDescriptor pattern, re-expressed.
    # Scales are NOT page-gathered: the wrapper pre-gathers them densely
    # per sequence with one XLA gather (4 bytes/token — trivial traffic)
    # so the int8 path issues the SAME number of page DMAs as bf16.  The
    # page-gather is ISSUE-bound (~0.25 µs/copy regardless of bytes,
    # docs/perf_notes.md round-2), so extra scale copies were costing more
    # than the halved payload saved.
    if quantized:
        q_ref, kvp_ref, ksd_ref, vsd_ref, o_ref, kvbuf, kvsem = refs
    else:
        q_ref, kvp_ref, o_ref, kvbuf, kvsem = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = len_ref[b]
    n_pages = jnp.maximum((length + page_tokens - 1) // page_tokens, 1)
    n_chunks = (n_pages + chunk_pages - 1) // chunk_pages
    ct = chunk_pages * page_tokens

    def page_id(idx):
        return pt_ref[b, jnp.minimum(idx, max_pages - 1)]

    def copies(ci, slot):
        # ONE copy per page covers K and V (merged [S_sub, PT, D] pages).
        return [
            pltpu.make_async_copy(
                kvp_ref.at[h, page_id(ci * chunk_pages + i)],
                kvbuf.at[slot, i],
                kvsem.at[slot, i],
            )
            for i in range(chunk_pages)
        ]

    def start(ci, slot):
        for c in copies(ci, slot):
            c.start()

    def wait(ci, slot):
        for c in copies(ci, slot):
            c.wait()

    q = q_ref[0, 0]  # [group_pad, D] (pre-scaled)
    # Prologue: fill the pipeline (up to DECODE_SLOTS waves in flight).
    for w in range(DECODE_SLOTS - 1):
        @pl.when(w < n_chunks)
        def _(w=w):
            start(w, w % DECODE_SLOTS)

    def body(ci, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(ci, DECODE_SLOTS)
        nxt = ci + DECODE_SLOTS - 1

        @pl.when(nxt < n_chunks)
        def _():
            start(nxt, jax.lax.rem(nxt, DECODE_SLOTS))

        wait(ci, slot)
        # int8 pools feed the MXU DIRECTLY (mixed bf16×int8 dots, exact —
        # see ops/quantized_attention kv_folded); float pools widen to the
        # compute dtype.  kvbuf[slot] is [cp, s_sub*PT, D] with K in token
        # rows [0, PT) and V in [PT, 2PT); s_sub == 1 means K IS V (MLA
        # latent pages).
        k = kvbuf[slot, :, :page_tokens].reshape(ct, head_dim)
        if kv_bits == 4:
            k = _unpack_kv4_low(k)
        elif not quantized:
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [group_pad, ct]
        if quantized:
            s = s * ksd_ref[0, 0, :, pl.ds(ci * ct, ct)]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (group_pad, ct), 1
        ) + ci * ct
        s = jnp.where(col < length, s, NEG_INF)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.where(
            jnp.isneginf(m_prev), 0.0, jnp.exp(m_prev - m_next)
        )
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        v = kvbuf[slot, :, (s_sub - 1) * page_tokens:].reshape(
            ct, head_dim
        )
        if kv_bits == 4:
            v = _unpack_kv4_high(v)
        elif not quantized:
            v = v.astype(q.dtype)
        if quantized:
            p = p * vsd_ref[0, 0, :, pl.ds(ci * ct, ct)]
        if v_tail_zero:
            # MLA latent pages: K carries [c | k_rope] but V is the bare
            # latent — zero the rope tail so one page pool serves both.
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (ct, head_dim), 1
            )
            v = jnp.where(lane < head_dim - v_tail_zero, v, 0)
        pv = jax.lax.dot_general(
            # int8 V: mixed dot (P in the compute dtype, V int8).
            p.astype(q.dtype if quantized else v.dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        return m_next, l_next, acc * alpha + pv

    init = (
        jnp.full((group_pad, 1), NEG_INF, jnp.float32),
        jnp.zeros((group_pad, 1), jnp.float32),
        jnp.zeros((group_pad, head_dim), jnp.float32),
    )
    _m, lsum, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    safe = jnp.where(lsum == 0.0, 1.0, lsum)
    o_ref[0, 0] = (acc / safe).astype(o_ref.dtype)


def _decode_kernel_streamed(
    # scalar prefetch
    pt_ref,  # [B, max_pages] physical page ids
    len_ref,  # [B] sequence lengths
    # tensors
    *refs,
    page_tokens: int,
    group_pad: int,
    head_dim: int,
    quantized: bool,
    kv_bits: int,
    v_tail_zero: int,
    precision,
):
    if quantized:
        q_ref, kv_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, kv_ref, o_ref, m_scr, l_scr, acc_scr = refs
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
        # Merged page block [1, 1, s_sub*PT, D]: K rows [0, PT).
        if kv_bits == 4:
            k = _unpack_kv4_low(kv_ref[0, 0, :page_tokens])
        elif quantized:
            k = kv_ref[0, 0, :page_tokens]
        else:
            k = kv_ref[0, 0, :page_tokens].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [group_pad, page_tokens]
        if quantized:
            s = s * ks_ref[0, 0]  # [1, page_tokens] row-vector scales
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

        if kv_bits == 4:
            v = _unpack_kv4_high(kv_ref[0, 0, kv_ref.shape[2] - page_tokens:])
        elif quantized:
            v = kv_ref[0, 0, kv_ref.shape[2] - page_tokens:]
        else:
            v = kv_ref[0, 0, kv_ref.shape[2] - page_tokens:].astype(q.dtype)
        if quantized:
            p = p * vs_ref[0, 0]  # row-vector V scales
        if v_tail_zero:
            # MLA latent pages: K carries [c | k_rope] but V is the bare
            # latent — zero the rope tail so one page pool serves both.
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (page_tokens, head_dim), 1
            )
            v = jnp.where(lane < head_dim - v_tail_zero, v, 0)
        pv = jax.lax.dot(
            # int8 V: mixed dot (P stays in the compute dtype).
            p.astype(q.dtype if quantized else v.dtype), v,
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
    kv_bits: int,
    v_tail_zero: int,
    precision,
):
    if quantized:
        q_ref, kv_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, kv_ref, o_ref, m_scr, l_scr, acc_scr = refs
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
        # kv_ref block is [1, 1, s_sub*PT, D]: K rows [0, PT), V rows
        # [PT, 2PT) (s_sub == 1 → K IS V, MLA latent pages; int4 → K/V
        # nibble-share the same byte rows).
        if kv_bits == 4:
            k = _unpack_kv4_low(kv_ref[0, 0, :page_tokens])
        elif quantized:
            k = kv_ref[0, 0, :page_tokens]
        else:
            k = kv_ref[0, 0, :page_tokens].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        if quantized:
            s = s * ks_ref[0, 0]  # [1, page_tokens] row-vector scales
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
        if kv_bits == 4:
            v = _unpack_kv4_high(kv_ref[0, 0, kv_ref.shape[2] - page_tokens:])
        elif quantized:
            v = kv_ref[0, 0, kv_ref.shape[2] - page_tokens:]
        else:
            v = kv_ref[0, 0, kv_ref.shape[2] - page_tokens:].astype(q.dtype)
        if quantized:
            p = p * vs_ref[0, 0]  # row-vector V scales
        if v_tail_zero:
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (page_tokens, head_dim), 1
            )
            v = jnp.where(lane < head_dim - v_tail_zero, v, 0)
        pv = jax.lax.dot(
            # int8 V: mixed dot (P stays in the compute dtype).
            p.astype(q.dtype if quantized else v.dtype), v,
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
    kv_pages: jnp.ndarray,
    page_row: jnp.ndarray,
    offset: jnp.ndarray,
    *,
    page_tokens: Optional[int] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    v_tail_zero: int = 0,
    kv_bits: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Chunked-prefill attention for ONE sequence over its paged cache.

    The chunk's K/V must already be written to the pages (the caller
    scatters before attending, exactly like the decode path).  Causal
    masking runs in global coordinates, so the chunk attends to the whole
    cached prefix plus its own triangle.

    Args:
      q: [Hq, chunk, D] chunk queries (chunk is trace-time static).
      kv_pages: [Hkv, num_pages, s_sub·page_tokens, D] merged page pool
        (see paged_decode_attention).
      page_row: [max_pages] int32 physical page ids for this sequence.
      offset: scalar int32 — the chunk's first global position.
      kv_bits: 4 → the pool is the K-low/V-high shared-byte int4 layout
        ([Hkv, num_pages, page_tokens, D] int8); only meaningful with
        scales.  8 (default) → int8 halves / float pool.

    Returns [Hq, chunk, D] in q.dtype.
    """
    quantized = k_scales is not None
    hq, chunk, d = q.shape
    hkv, _n, page_rows, dk = kv_pages.shape
    if page_tokens is None:
        page_tokens = page_rows  # s_sub == 1 (MLA latent pages)
    s_sub = page_rows // page_tokens
    assert dk == d and s_sub in (1, 2) and hq % hkv == 0
    if kv_bits == 4:
        assert quantized and s_sub == 1 and v_tail_zero == 0, (
            "int4 pools need scales, a [.., page_tokens, D] shared-byte "
            "pool, and no MLA tail"
        )
    else:
        kv_bits = 8
    group = hq // hkv
    max_pages = page_row.shape[0]
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()

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

    page_index_sc = page_index

    in_specs = [
        pl.BlockSpec((1, rows_pad, d), lambda h, j, pt, off: (h, 0, 0)),
        pl.BlockSpec((1, 1, s_sub * page_tokens, d), page_index),
    ]
    if quantized:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, page_tokens), page_index_sc)
        )
        in_specs.append(
            pl.BlockSpec((1, 1, 1, page_tokens), page_index_sc)
        )
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
        kv_bits=kv_bits,
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
        *([kv_pages, k_scales, v_scales] if quantized else [kv_pages]),
    )
    return out[:, :rows, :].reshape(hq, chunk, d)


def paged_decode_attention(
    q: jnp.ndarray,
    kv_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    page_tokens: Optional[int] = None,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    v_tail_zero: int = 0,
    kv_bits: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-token decode attention over a paged KV cache.

    Args:
      q: [B, Hq, D] current-step queries.
      kv_pages: [Hkv, num_pages, S_sub, page_tokens, D] MERGED page pool —
        S_sub == 2 → K at sub-index 0, V at 1; S_sub == 1 → one state per
        token serves both sides (MLA latent pages).  One DMA per page
        covers everything (the gather is issue-bound, not byte-bound).
      page_table: [B, max_pages_per_seq] int32 physical page ids (entries
        past a sequence's last page are ignored).
      lengths: [B] int32 — tokens currently in each sequence's cache
        (INCLUDING the token being decoded, which the caller has already
        appended; every length must be ≥ 1).
      k_scales, v_scales: [Hkv, num_pages, 1, page_tokens] per-token
        symmetric scales for int8/int4 pools, LANE-major row vectors —
        gathered DENSELY per batch with one XLA gather (4 B/token) and
        folded into the score/probability rows in-kernel.
      kv_bits: 4 → the pool is the K-low/V-high shared-byte int4 layout
        ([Hkv, num_pages, page_tokens, D] int8, a QUARTER of bf16's
        bytes in the bandwidth-bound decode regime — the reference's
        "INT4 = 3.0× faster" claim, ``README.md:291-296``).

    Returns [B, Hq, D] in q.dtype.
    """
    quantized = k_scales is not None
    b, hq, d = q.shape
    hkv, _num_pages, page_rows, dk = kv_pages.shape
    if page_tokens is None:
        page_tokens = page_rows  # s_sub == 1 (MLA latent pages)
    s_sub = page_rows // page_tokens
    assert dk == d and s_sub in (1, 2)
    assert hq % hkv == 0
    if kv_bits == 4:
        assert quantized and s_sub == 1 and v_tail_zero == 0, (
            "int4 pools need scales, a [.., page_tokens, D] shared-byte "
            "pool, and no MLA tail"
        )
    else:
        kv_bits = 8
    group = hq // hkv
    max_pages = page_table.shape[1]
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()

    group_pad = max(8, group)
    qg = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qg = qg.reshape(b, hkv, group, d)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    if d % 128 != 0:
        # Lane-padded head dims cannot be DMA-sliced out of the tiled HBM
        # pool (Mosaic alignment) — fall back to the BlockSpec-STREAMED
        # kernel: one page per grid step, the pipeline prefetches via the
        # clamped index map.  Slower per byte than the wave gather, but
        # d < 128 pages are small.
        def page_index(bi, h, j, pt, ln):
            last_page = jnp.maximum(ln[bi] - 1, 0) // page_tokens
            return (h, pt[bi, jnp.minimum(j, last_page)], 0, 0)

        in_specs = [
            pl.BlockSpec(
                (1, 1, group_pad, d),
                lambda bi, h, j, pt, ln: (bi, h, 0, 0),
            ),
            pl.BlockSpec((1, 1, s_sub * page_tokens, d), page_index),
        ]
        inputs = [qg, kv_pages]
        if quantized:
            in_specs.append(pl.BlockSpec((1, 1, 1, page_tokens), page_index))
            inputs.append(k_scales)
            in_specs.append(pl.BlockSpec((1, 1, 1, page_tokens), page_index))
            inputs.append(v_scales)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv, max_pages),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, group_pad, d),
                lambda bi, h, j, pt, ln: (bi, h, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((group_pad, 128), jnp.float32),
                pltpu.VMEM((group_pad, 128), jnp.float32),
                pltpu.VMEM((group_pad, d), jnp.float32),
            ],
        )
        kernel = functools.partial(
            _decode_kernel_streamed,
            page_tokens=page_tokens,
            group_pad=group_pad,
            head_dim=d,
            quantized=quantized,
            kv_bits=kv_bits,
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

    chunk_pages = min(DECODE_CHUNK_PAGES, max_pages)

    in_specs = [
        pl.BlockSpec(
            (1, 1, group_pad, d), lambda bi, h, pt, ln: (bi, h, 0, 0)
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),  # page pool stays in HBM
    ]
    inputs = [qg, kv_pages]
    if quantized:
        # Densify this batch's scales with ONE gather (4 B/token) so the
        # kernel reads them as a plain VMEM input — no per-page scale DMAs.
        def densify(sc):
            g = sc[:, page_table]  # [Hkv, B, MP, 1, PT]
            return g.transpose(1, 0, 2, 3, 4).reshape(
                b, hkv, 1, max_pages * page_tokens
            )

        ks_dense = densify(k_scales)
        vs_dense = densify(v_scales)
        sc_spec = pl.BlockSpec(
            (1, 1, 1, max_pages * page_tokens),
            lambda bi, h, pt, ln: (bi, h, 0, 0),
        )
        in_specs.append(sc_spec)
        inputs.append(ks_dense)
        in_specs.append(sc_spec)
        inputs.append(vs_dense)

    scratch = [
        pltpu.VMEM(
            (DECODE_SLOTS, chunk_pages, s_sub * page_tokens, d),
            kv_pages.dtype,
        ),
        pltpu.SemaphoreType.DMA((DECODE_SLOTS, chunk_pages)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, group_pad, d), lambda bi, h, pt, ln: (bi, h, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel,
        page_tokens=page_tokens,
        chunk_pages=chunk_pages,
        max_pages=max_pages,
        group_pad=group_pad,
        head_dim=d,
        s_sub=s_sub,
        quantized=quantized,
        kv_bits=kv_bits,
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
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), *inputs)
    return out[:, :, :group, :].reshape(b, hq, d)
