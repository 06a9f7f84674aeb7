"""Quantized GEMM Pallas kernels.

TPU-native redesign of the reference's generated quantized GEMM
(``GEMMKernel+Multiply.swift:128-158`` — ``load_quantized_int8/int4``
dequantizing loads; ``GEMMHeaders.swift:678-808``) and of the blockwise
zero-point compensation contract (``BlockwiseCompensationTest.swift:10-17``,
``GEMMQuantization.swift:690`` precomputedSums):

- :func:`quantized_matmul` — A (bf16/fp32) × quantized Bᵀ, dequant-on-load:
  int8 / packed-int4 tiles are fetched from HBM (the bandwidth win), widened
  and scaled on the VPU, then hit the MXU at the float precision of A.
  Supports TENSOR / ROW (per-output-channel) / BLOCK (per-K-block)
  granularities.
- :func:`compensated_matmul` — both operands int8: the MXU runs pure
  int8×int8→int32 block products and the zero-point correction
  ``s_a·s_b·(Sqq − z_b·SqA − z_a·SqB + cnt·z_a·z_b)`` is applied per K-block
  from precomputed per-row block sums, exactly the reference's contract.
  Requires the quant block size to be a lane-aligned multiple of 128 (one
  grid step per quant block); smaller blocks fall back to dequant-on-load.

Weights are stored TRANSPOSED ([N, K], reduction dim last) — the natural TPU
layout (both operands contract on the lane dimension) and the layout the
QuantizedTensor BLOCK granularity blocks over.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_plus_tpu.quant.params import (
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import (
    QuantizedTensor,
    unpack_int4,
)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# Weight-only dequant-on-load kernel
# ---------------------------------------------------------------------------


def unpack_int4_tile(qtile: jnp.ndarray, bk: int) -> jnp.ndarray:
    """In-kernel group-planar int4 unpack: packed [R, bk//2] → f32 [R, bk].

    Mirrors ``quant.tensor.pack_int4``: per 256-element group, the low
    nibbles of the group's packed bytes hold its first half of columns, the
    high nibbles the second half (a short tail group splits at its
    midpoint).  Only static lane slices + lane concat — the ops Mosaic
    actually supports (strided access / stack / sub-byte bitcasts are not
    lowerable; this layout is chosen *because* of that).

    ``bk`` must start at a 256-group boundary (the wrappers tile K in
    multiples of 256, or pass a full un-tiled dimension).
    """
    groups = []
    for base in range(0, bk, 256):
        g = min(256, bk - base)
        byte = qtile[:, base // 2 : (base + g) // 2]
        # Nibble math widened to int32: Mosaic lowers neither 8-bit vector
        # arithmetic (arith.subi on vector<i8>) nor uint8→f32 casts.
        wide = byte.astype(jnp.int32)
        groups.append(((wide & 0xF) - 8).astype(jnp.float32))
        groups.append(((wide >> 4) & 0xF).astype(jnp.float32) - 8.0)
    return jnp.concatenate(groups, axis=1)


def dequant_kv_vals(payload, scale, zp, d, bits, compute_dtype):
    """Array form of :func:`dequant_kv_tile`: (payload [bkv, pd], per-token
    scale/zp [bkv, 1]) → float [bkv, d].  Used by the two-level attention
    kernels, which slice inner subtiles out of a major tile ref."""
    if bits == 4:
        w = unpack_int4_tile(payload, d)  # f32 [bkv, d]
    else:
        w = payload.astype(jnp.int32).astype(jnp.float32)
    return ((w - zp) * scale).astype(compute_dtype)


def dequant_kv_tile(q_ref, s_ref, z_ref, bkv, d, bits, compute_dtype):
    """(4D payload tile ref, per-token scale/zp refs) → float [bkv, d] tile.

    Shared by the quantized attention forward and backward kernels: widen
    the int8 / group-planar-int4 payload and apply per-token (scale, zp).
    """
    return dequant_kv_vals(
        q_ref[0, 0], s_ref[0, 0], z_ref[0, 0], d, bits, compute_dtype
    )


def dequant_kv_tile_block2d(
    q_ref, s_ref, z_ref, er_ref, ec_ref, bkv, d, bits, compute_dtype
):
    """BLOCK_2D (block_rows × block_size) K/V dequant with MXU-expanded
    scales.

    The reference's kernels look up a per-8×8-tile scale/zero-point inside
    the accumulate loop (``AttentionKernel+Accumulate.swift:451-511``).
    Mosaic has no element-repeat lowering to expand a [bkv/br, d/bs] scale
    tile to [bkv, d] on the VPU — instead the expansion rides the MXU as
    two small 0/1 block-diagonal dots (≪1% of the tile's FLOPs):

        s_full = E_r[bkv, bkv/br] · s · E_c[d/bs, d]

    and dequant is ``w · s_full − (z·s)_full`` (the z·s product is
    blockwise-constant, so it expands the same way).  ``er_ref`` is None
    when block_rows == 1 (scales already per-row).
    """
    return dequant_block2d_vals(
        q_ref[0, 0], s_ref[0, 0], z_ref[0, 0],
        None if er_ref is None else er_ref[...], ec_ref[...],
        d, bits, compute_dtype,
    )


def dequant_block2d_vals(payload, s, z, er, ec, d, bits, compute_dtype):
    """Array form of :func:`dequant_kv_tile_block2d` (see its docstring)."""
    if bits == 4:
        w = unpack_int4_tile(payload, d)
    else:
        w = payload.astype(jnp.int32).astype(jnp.float32)
    s = s.astype(jnp.float32)  # [bkv/br, d/bs]
    zs = z.astype(jnp.float32) * s
    if er is not None:
        s = jax.lax.dot(er, s, preferred_element_type=jnp.float32)
        zs = jax.lax.dot(er, zs, preferred_element_type=jnp.float32)
    s_full = jax.lax.dot(s, ec, preferred_element_type=jnp.float32)
    zs_full = jax.lax.dot(zs, ec, preferred_element_type=jnp.float32)
    return (w * s_full - zs_full).astype(compute_dtype)


def block2d_expanders(block_rows: int, block_size: int, bkv: int, d: int):
    """Host-side 0/1 expansion operands for
    :func:`dequant_kv_tile_block2d`: (E_r [bkv, bkv/br] or None, E_c
    [d/bs, d])."""
    ec = np.equal(
        np.arange(d)[None, :] // block_size,
        np.arange(d // block_size)[:, None],
    ).astype(np.float32)
    if block_rows == 1:
        return None, jnp.asarray(ec)
    er = np.equal(
        np.arange(bkv)[:, None] // block_rows,
        np.arange(bkv // block_rows)[None, :],
    ).astype(np.float32)
    return jnp.asarray(er), jnp.asarray(ec)


def _dequant_tile(qtile, scale_ref, zp_ref, j, k, *, cfg, bn, bk, out_dtype):
    """Widen + scale one [bn, bk] (or packed [bn, bk//2]) weight tile."""
    if cfg.bits == 4:
        q = unpack_int4_tile(qtile, bk)
    else:
        q = qtile
    q = q.astype(jnp.float32)

    g = cfg.granularity
    if g == QuantGranularity.TENSOR:
        scale = scale_ref[0, 0]
        zp = zp_ref[0, 0].astype(jnp.float32)
        deq = (q - zp) * scale
    elif g == QuantGranularity.ROW:
        # Per-output-channel: one (scale, zp) per row of Bᵀ.
        scale = scale_ref[...]  # [bn, 1]
        zp = zp_ref[...].astype(jnp.float32)
        deq = (q - zp) * scale
    elif g == QuantGranularity.BLOCK:
        # Per-K-block shared across rows.  The wrapper pre-expands the
        # per-block scale/zp to per-ELEMENT [1, K] vectors (K floats of HBM —
        # negligible next to the N×K payload) so the kernel needs no
        # lane-expansion gymnastics: a [1, bk] tile broadcasts over rows.
        scale = scale_ref[...]  # [1, bk]
        zp = zp_ref[...].astype(jnp.float32)
        deq = (q - zp) * scale
    else:
        raise NotImplementedError(g)
    return deq.astype(out_dtype)


def _wo_kernel(
    a_ref, bq_ref, scale_ref, zp_ref, *rest,
    cfg, bm, bn, bk, precision, compute_dtype, has_c=False,
):
    # ``has_c``: accumulate onto an existing C in the store epilogue — the
    # reference's ``loadPreviousC`` (``GEMMDescriptor.swift:11-94``,
    # ``GEMMKernel+Caching.swift`` createLoadC).  C streams in as one more
    # [bm, bn] tile and adds in fp32 before the final cast.
    if has_c:
        c_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b_deq = _dequant_tile(
        bq_ref[...], scale_ref, zp_ref, pl.program_id(1), k,
        cfg=cfg, bn=bn, bk=bk, out_dtype=compute_dtype,
    )
    acc_ref[...] += jax.lax.dot_general(
        a_ref[...].astype(compute_dtype),
        b_deq,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(k == nk - 1)
    def _store():
        r = acc_ref[...]
        if has_c:
            r = r + c_ref[...].astype(jnp.float32)
        out_ref[...] = r.astype(out_ref.dtype)


def _wo_folded_kernel(
    a_ref, bq_ref, scale_ref, *rest,
    bits, bk, tensor_scale, has_c=False,
):
    if has_c:
        c_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    # Dequant-free weight-only GEMM: the int8 payload (int4 unpacked to
    # int8 in-kernel) feeds a MIXED bf16×int8 MXU dot directly; the
    # symmetric per-channel/tensor scales multiply the accumulator ONCE at
    # store (out[m, n] = Σ_k a·w_int · s_n).  Zero per-tile dequant VPU
    # work — measured faster than XLA's own bf16 matmul at prefill shapes
    # (docs/perf_notes.md "folded int8").
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bq = bq_ref[...]
    if bits == 4:
        bq = unpack_int4_tile_int8(bq, bk)
    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], bq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _store():
        s = scale_ref[0, 0] if tensor_scale else scale_ref[...]  # [1, bn]
        r = acc_ref[...] * s
        if has_c:
            # loadPreviousC epilogue: C is NOT scaled — only the A·B part
            # carries the folded weight scales.
            r = r + c_ref[...].astype(jnp.float32)
        out_ref[...] = r.astype(out_ref.dtype)


def quantized_matmul(
    a: jnp.ndarray,
    b_t: QuantizedTensor,
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype: Optional[jnp.dtype] = None,
    c: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """A [M, K] (bf16/fp32) × dequant(Bᵀ [N, K]) → [M, N].

    The weight payload moves HBM→VMEM at its integer width.  With
    symmetric TENSOR/ROW scales and a non-fp32 A the FOLDED kernel runs
    (mixed bf16×int8 dots, scales applied once at store); otherwise
    dequantization happens on tiles in VMEM (the ``load_quantized_*``
    analog).

    ``c``: optional [M, N] accumulate-into-C operand — the result is
    ``c + A·dequant(B)ᵀ`` with C added in fp32 in the store epilogue (the
    reference's ``loadPreviousC``, ``GEMMDescriptor.swift:11-94``).
    """
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()
    m, kdim = a.shape
    n, k2 = b_t.shape
    assert kdim == k2, (kdim, k2)
    cfg = b_t.config
    out_dtype = out_dtype or a.dtype

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(kdim, 128))
    if cfg.granularity == QuantGranularity.BLOCK:
        bs = cfg.block_size
        if bk % bs != 0:
            bk = max(bs, (bk // bs) * bs)
        assert kdim % bs == 0
    if cfg.bits == 4:
        # Group-planar packing unpacks in 256-element groups; K and the
        # k-tile must align to them.
        bk = _round_up(bk, 256)
        if kdim % 256 != 0:
            raise ValueError(
                f"int4 kernel path requires K % 256 == 0 (got K={kdim}); "
                "dequantize explicitly for ragged K"
            )

    m_p, n_p, k_p = _round_up(m, bm), _round_up(n, bn), _round_up(kdim, bk)
    if (m_p, k_p) != (m, kdim):
        a = jnp.pad(a, ((0, m_p - m), (0, k_p - kdim)))
    payload = b_t.data  # [N, K] int8 or [N, K//2] uint8
    pk = payload.shape[-1]
    pk_p = k_p // 2 if cfg.bits == 4 else k_p
    if (n_p, pk_p) != payload.shape:
        payload = jnp.pad(payload, ((0, n_p - n), (0, pk_p - pk)))
    if c is not None:
        assert c.shape == (m, n), (c.shape, m, n)
        if (m_p, n_p) != (m, n):
            c = jnp.pad(c, ((0, m_p - m), (0, n_p - n)))
    c_spec = [pl.BlockSpec((bm, bn), lambda i, j, k: (i, j))]
    c_in = [] if c is None else [c]

    g = cfg.granularity
    scale, zp = b_t.scale, b_t.zero_point
    folded = (
        cfg.strategy == QuantStrategy.SYMMETRIC
        and g in (QuantGranularity.TENSOR, QuantGranularity.ROW)
        and a.dtype != jnp.float32
    )
    if folded:
        tensor_scale = g == QuantGranularity.TENSOR
        if tensor_scale:
            scale_t = scale.reshape(1, 1).astype(jnp.float32)
            scale_spec = pl.BlockSpec((1, 1), lambda i, j, k: (0, 0))
        else:
            scale_t = jnp.pad(
                scale.reshape(1, -1).astype(jnp.float32),
                ((0, 0), (0, n_p - n)),
            )
            scale_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j))
        payload_bk = bk // 2 if cfg.bits == 4 else bk
        kernel = functools.partial(
            _wo_folded_kernel,
            bits=cfg.bits, bk=bk, tensor_scale=tensor_scale,
            has_c=c is not None,
        )
        out = pl.pallas_call(
            kernel,
            grid=(m_p // bm, n_p // bn, k_p // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bn, payload_bk), lambda i, j, k: (j, k)),
                scale_spec,
            ] + (c_spec if c is not None else []),
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_p * n_p * k_p,
                bytes_accessed=int(
                    a.size * a.dtype.itemsize + payload.size + m_p * n_p * 4
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(a.astype(jnp.bfloat16), payload, scale_t, *c_in)
        return out[:m, :n]
    if g == QuantGranularity.TENSOR:
        scale_spec = pl.BlockSpec((1, 1), lambda i, j, k: (0, 0))
        zp_spec = pl.BlockSpec((1, 1), lambda i, j, k: (0, 0))
    elif g == QuantGranularity.ROW:
        scale = jnp.pad(scale, ((0, n_p - n), (0, 0)))
        zp = jnp.pad(zp, ((0, n_p - n), (0, 0)))
        scale_spec = pl.BlockSpec((bn, 1), lambda i, j, k: (j, 0))
        zp_spec = pl.BlockSpec((bn, 1), lambda i, j, k: (j, 0))
    elif g == QuantGranularity.BLOCK:
        # Expand per-block params to per-element [1, K] (see kernel comment).
        scale = jnp.repeat(
            scale.reshape(1, -1), cfg.block_size, axis=-1
        ).astype(jnp.float32)
        zp = jnp.repeat(zp.reshape(1, -1), cfg.block_size, axis=-1)
        scale = jnp.pad(
            scale, ((0, 0), (0, k_p - kdim)), constant_values=1.0
        )
        zp = jnp.pad(zp, ((0, 0), (0, k_p - kdim)))
        scale_spec = pl.BlockSpec((1, bk), lambda i, j, k: (0, k))
        zp_spec = pl.BlockSpec((1, bk), lambda i, j, k: (0, k))
    else:
        raise NotImplementedError(g)

    compute_dtype = jnp.float32 if a.dtype == jnp.float32 else jnp.bfloat16
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    payload_bk = bk // 2 if cfg.bits == 4 else bk

    kernel = functools.partial(
        _wo_kernel,
        cfg=cfg, bm=bm, bn=bn, bk=bk,
        precision=precision, compute_dtype=compute_dtype,
        has_c=c is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=(m_p // bm, n_p // bn, k_p // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, payload_bk), lambda i, j, k: (j, k)),
            scale_spec,
            zp_spec,
        ] + (c_spec if c is not None else []),
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * k_p,
            bytes_accessed=int(
                a.size * a.dtype.itemsize + payload.size + m_p * n_p * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, payload, scale, zp, *c_in)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Quantized-A × float-B (the reference dequant-loads EITHER operand:
# ``GEMMKernel+Multiply.swift:128-158`` selects load_quantized_* per operand)
# ---------------------------------------------------------------------------


def _qa_kernel(
    aq_ref, b_ref, scale_ref, zp_ref, out_ref, acc_ref,
    *, cfg, bm, bk, precision, compute_dtype,
):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if cfg.bits == 4:
        q = unpack_int4_tile(aq_ref[...], bk)
    else:
        q = aq_ref[...].astype(jnp.float32)
    g = cfg.granularity
    if g == QuantGranularity.TENSOR:
        scale = scale_ref[0, 0]
        zp = zp_ref[0, 0].astype(jnp.float32)
    else:
        # ROW → [bm, 1] per-A-row; BLOCK → [1, bk] per-element-expanded.
        scale = scale_ref[...]
        zp = zp_ref[...].astype(jnp.float32)
    a_deq = ((q - zp) * scale).astype(compute_dtype)
    acc_ref[...] += jax.lax.dot_general(
        a_deq,
        b_ref[...].astype(compute_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(k == nk - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _qa_folded_kernel(
    aq_ref, b_ref, scale_ref, out_ref, acc_ref, *, bits, bk, tensor_scale,
):
    # Dequant-free: the int8 A payload feeds a MIXED int8×bf16 MXU dot;
    # symmetric TENSOR/ROW(-of-A) scales multiply the accumulator rows once
    # at store — the transpose of _wo_folded_kernel's fold.
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    aq = aq_ref[...]
    if bits == 4:
        aq = unpack_int4_tile_int8(aq, bk)
    acc_ref[...] += jax.lax.dot_general(
        aq, b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _store():
        s = scale_ref[0, 0] if tensor_scale else scale_ref[...]  # [bm, 1]
        out_ref[...] = (acc_ref[...] * s).astype(out_ref.dtype)


def quantized_matmul_qa(
    a_q: QuantizedTensor,
    b: jnp.ndarray,
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype: Optional[jnp.dtype] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """dequant(A [M, K]) × B [K, N] (bf16/fp32) → [M, N].

    The quantized-ACTIVATION orientation of :func:`quantized_matmul`: the A
    payload moves HBM→VMEM at integer width and is widened in-kernel.  With
    symmetric TENSOR/ROW scales and a non-fp32 B, the FOLDED kernel runs
    (mixed int8×bf16 dots; per-row scales multiply the output rows once at
    store).  ROW granularity here means per-row-of-A (the natural transpose
    of ``quantized_matmul``'s per-output-channel).
    """
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()
    m, kdim = a_q.shape
    k2, n = b.shape
    assert kdim == k2, (kdim, k2)
    cfg = a_q.config
    out_dtype = out_dtype or b.dtype

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(kdim, 128))
    if cfg.granularity == QuantGranularity.BLOCK:
        bs = cfg.block_size
        if bk % bs != 0:
            bk = max(bs, (bk // bs) * bs)
            bk = _round_up(bk, 128)
        assert kdim % bs == 0
    if cfg.bits == 4:
        bk = _round_up(bk, 256)
        if kdim % 256 != 0:
            raise ValueError(
                f"int4 kernel path requires K % 256 == 0 (got K={kdim}); "
                "dequantize explicitly for ragged K"
            )

    m_p, n_p, k_p = _round_up(m, bm), _round_up(n, bn), _round_up(kdim, bk)
    payload = a_q.data  # [M, K] int8 or [M, K//2] packed uint8
    pk_p = k_p // 2 if cfg.bits == 4 else k_p
    if (m_p, pk_p) != payload.shape:
        payload = jnp.pad(
            payload,
            ((0, m_p - m), (0, pk_p - payload.shape[1])),
            constant_values=0x88 if cfg.bits == 4 else 0,
        )
    if (k_p, n_p) != b.shape:
        b = jnp.pad(b, ((0, k_p - kdim), (0, n_p - n)))

    g = cfg.granularity
    scale, zp = a_q.scale, a_q.zero_point
    payload_bk = bk // 2 if cfg.bits == 4 else bk
    folded = (
        cfg.strategy == QuantStrategy.SYMMETRIC
        and g in (QuantGranularity.TENSOR, QuantGranularity.ROW)
        and b.dtype != jnp.float32
    )
    if folded:
        tensor_scale = g == QuantGranularity.TENSOR
        if tensor_scale:
            scale_t = scale.reshape(1, 1).astype(jnp.float32)
            scale_spec = pl.BlockSpec((1, 1), lambda i, j, k: (0, 0))
        else:
            scale_t = jnp.pad(
                scale.reshape(-1, 1).astype(jnp.float32),
                ((0, m_p - m), (0, 0)),
            )
            scale_spec = pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0))
        out = pl.pallas_call(
            functools.partial(
                _qa_folded_kernel,
                bits=cfg.bits, bk=bk, tensor_scale=tensor_scale,
            ),
            grid=(m_p // bm, n_p // bn, k_p // bk),
            in_specs=[
                pl.BlockSpec((bm, payload_bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                scale_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_p * n_p * k_p,
                bytes_accessed=int(
                    payload.size + b.size * b.dtype.itemsize + m_p * n_p * 4
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(payload, b.astype(jnp.bfloat16), scale_t)
        return out[:m, :n]

    if g == QuantGranularity.TENSOR:
        scale_spec = pl.BlockSpec((1, 1), lambda i, j, k: (0, 0))
        zp_spec = pl.BlockSpec((1, 1), lambda i, j, k: (0, 0))
    elif g == QuantGranularity.ROW:
        scale = jnp.pad(scale, ((0, m_p - m), (0, 0)))
        zp = jnp.pad(zp, ((0, m_p - m), (0, 0)))
        scale_spec = pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0))
        zp_spec = pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0))
    elif g == QuantGranularity.BLOCK:
        scale = jnp.repeat(
            scale.reshape(1, -1), cfg.block_size, axis=-1
        ).astype(jnp.float32)
        zp = jnp.repeat(zp.reshape(1, -1), cfg.block_size, axis=-1)
        scale = jnp.pad(
            scale, ((0, 0), (0, k_p - kdim)), constant_values=1.0
        )
        zp = jnp.pad(zp, ((0, 0), (0, k_p - kdim)))
        scale_spec = pl.BlockSpec((1, bk), lambda i, j, k: (0, k))
        zp_spec = pl.BlockSpec((1, bk), lambda i, j, k: (0, k))
    else:
        raise NotImplementedError(g)

    compute_dtype = jnp.float32 if b.dtype == jnp.float32 else jnp.bfloat16
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(
            _qa_kernel,
            cfg=cfg, bm=bm, bk=bk,
            precision=precision, compute_dtype=compute_dtype,
        ),
        grid=(m_p // bm, n_p // bn, k_p // bk),
        in_specs=[
            pl.BlockSpec((bm, payload_bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            scale_spec,
            zp_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * k_p,
            bytes_accessed=int(
                payload.size + b.size * b.dtype.itemsize + m_p * n_p * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(payload, b, scale, zp)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Both-operands int8 with blockwise compensation (int8 MXU path)
# ---------------------------------------------------------------------------


def per_row_block_sums(qt: QuantizedTensor) -> jnp.ndarray:
    """Per-row per-K-block Σq — the compensation's SqA/SqB input
    ([M, K] payload → int32 [M, K/bs]).  Computed once per tensor (the
    ``precomputedSums`` analog); the fused runtime quantizer also emits it."""
    q = unpack_int4(qt.data) if qt.bits == 4 else qt.data
    q = q.reshape(qt.shape).astype(jnp.int32)
    m, k = qt.shape[-2], qt.shape[-1]
    bs = qt.config.block_size
    return q.reshape(*qt.shape[:-1], k // bs, bs).sum(axis=-1)


def _comp_kernel(
    aq_ref, bq_ref, sa_ref, za_ref, sb_ref, zb_ref, sqa_ref, sqb_ref,
    *rest, bs, has_c=False,
):
    if has_c:
        c_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    sqq = jax.lax.dot_general(
        aq_ref[...],
        bq_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bm, bn] int32 — pure int8 MXU block product
    # Scales / zero points live in SMEM ([1, nb] full arrays, scalar reads).
    sa = sa_ref[0, k]
    sb = sb_ref[0, k]
    za = za_ref[0, k]
    zb = zb_ref[0, k]
    # Per-row block sums: full [bm, nb] VMEM tiles; select block k's column
    # via an iota mask + row reduce (Mosaic cannot load a single dynamic
    # lane; nb is small so the masked reduce is a handful of VPU ops).
    def _col(ref):
        vals = ref[...]
        colmask = (
            jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1) == k
        )
        return jnp.sum(
            jnp.where(colmask, vals, 0), axis=1, keepdims=True
        )

    sqa = _col(sqa_ref)  # [bm, 1] int32
    sqb = _col(sqb_ref)  # [bn, 1]
    comp = (
        sqq
        - zb * sqa
        - za * jnp.transpose(sqb)
        + (bs * za * zb)
    ).astype(jnp.float32)
    acc_ref[...] += (sa * sb) * comp

    @pl.when(k == nk - 1)
    def _store():
        r = acc_ref[...]
        if has_c:
            r = r + c_ref[...].astype(jnp.float32)  # loadPreviousC
        out_ref[...] = r.astype(out_ref.dtype)


def _comp_small_kernel(
    aq_ref, bq_ref, sa_ref, zsa_ref, sb_ref, zsb_ref, *rest, has_c=False,
):
    if has_c:
        c_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    # Sub-128 quant blocks: the per-K-block compensation
    #   Σ_b s_a·s_b·(Sqq − z_b·SqA − z_a·SqB + cnt·z_a·z_b)
    # is algebraically Σ_k (qa−z_a)·s_a · (qb−z_b)·s_b — per-element dequant
    # with blockwise-constant (s, z·s) vectors (expanded host-side to [1, K],
    # K floats of HBM — negligible next to the N·K payload).  Blocks smaller
    # than a lane tile can't be separated inside an int8 MXU dot without a
    # per-block dot (contraction < 128 → part-empty systolic array), so this
    # arm trades the int8 MXU rate for exact f32 dequant + HIGHEST dots —
    # the same trade the reference makes when its per-8×8-tile scale lookup
    # runs inside the accumulate loop (AttentionKernel+Accumulate.swift:
    # 451-511).  The pure-int8 fast path engages at block_size % 128 == 0.
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a_deq = (
        aq_ref[...].astype(jnp.float32) * sa_ref[...] - zsa_ref[...]
    )
    b_deq = (
        bq_ref[...].astype(jnp.float32) * sb_ref[...] - zsb_ref[...]
    )
    acc_ref[...] += jax.lax.dot_general(
        a_deq, b_deq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(k == nk - 1)
    def _store():
        r = acc_ref[...]
        if has_c:
            r = r + c_ref[...].astype(jnp.float32)  # loadPreviousC
        out_ref[...] = r.astype(out_ref.dtype)


def _expand_block_params(t: QuantizedTensor, k_p: int):
    """Per-K-block (scale, z·scale) → per-element [1, K] f32 vectors."""
    bs = t.config.block_size
    s = jnp.repeat(t.scale.reshape(1, -1), bs, axis=-1).astype(jnp.float32)
    zs = jnp.repeat(
        (t.zero_point.astype(jnp.float32) * t.scale).reshape(1, -1),
        bs, axis=-1,
    )
    kdim = s.shape[-1]
    if k_p != kdim:
        s = jnp.pad(s, ((0, 0), (0, k_p - kdim)), constant_values=1.0)
        zs = jnp.pad(zs, ((0, 0), (0, k_p - kdim)))
    return s, zs


def _compensated_small_blocks(
    a, b_t, *, block_m, block_n, out_dtype, interpret, c=None
):
    """Sub-128-block arm of :func:`compensated_matmul` (see kernel note)."""
    bs = a.config.block_size
    m, kdim = a.shape
    n, _ = b_t.shape
    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    # k-tile: lane-aligned AND whole quant blocks (bs % 8 == 0 per the
    # QuantConfig contract; bs ∈ {16..64} divides 128, others lcm up).
    base = 128
    while base % bs != 0:
        base += 128
    bk = base * max(1, min(512, kdim) // base)

    m_p, n_p = _round_up(m, bm), _round_up(n, bn)
    k_p = _round_up(kdim, bk)
    aq, bq = a.data, b_t.data
    if (m_p, k_p) != aq.shape:
        aq = jnp.pad(aq, ((0, m_p - m), (0, k_p - kdim)))
    if (n_p, k_p) != bq.shape:
        bq = jnp.pad(bq, ((0, n_p - n), (0, k_p - kdim)))
    sa, zsa = _expand_block_params(a, k_p)
    sb, zsb = _expand_block_params(b_t, k_p)
    if c is not None and (m_p, n_p) != c.shape:
        c = jnp.pad(c, ((0, m_p - m), (0, n_p - n)))
    c_in = [] if c is None else [c]

    vec_spec = pl.BlockSpec((1, bk), lambda i, j, k: (0, k))
    out = pl.pallas_call(
        functools.partial(_comp_small_kernel, has_c=c is not None),
        grid=(m_p // bm, n_p // bn, k_p // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
            vec_spec, vec_spec, vec_spec, vec_spec,
        ] + (
            [pl.BlockSpec((bm, bn), lambda i, j, k: (i, j))]
            if c is not None else []
        ),
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * k_p,
            bytes_accessed=int(aq.size + bq.size + m_p * n_p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(aq, bq, sa, zsa, sb, zsb, *c_in)
    return out[:m, :n]


def compensated_matmul(
    a: QuantizedTensor,
    b_t: QuantizedTensor,
    *,
    block_m: int = 512,
    block_n: int = 512,
    out_dtype: jnp.dtype = jnp.float32,
    c: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """int8 A [M, K] × int8 Bᵀ [N, K] with per-K-block zero-point
    compensation → fp32 [M, N].

    ``c``: optional [M, N] accumulate-into-C operand (``loadPreviousC``,
    ``GEMMDescriptor.swift:11-94``): result = c + dequant(A)·dequant(B)ᵀ.

    At ``block_size % 128 == 0``: one grid step per quant block
    (``bk == block_size``), so the scale / zero-point factors stay out of
    the MXU loop — the MXU sees only int8×int8→int32.  Smaller blocks
    (the reference's {16..64} contract sizes,
    ``BlockwiseQuantizationContract.swift:176-217``) run the exact
    per-element-dequant arm (see ``_comp_small_kernel``).
    """
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()
    assert a.bits == 8 and b_t.bits == 8, "compensated path is int8×int8"
    cfg_a, cfg_b = a.config, b_t.config
    assert cfg_a.granularity == QuantGranularity.BLOCK
    assert cfg_b.granularity == QuantGranularity.BLOCK
    bs = cfg_a.block_size
    assert bs == cfg_b.block_size, "operand block sizes must match"
    if bs % 128 != 0:
        return _compensated_small_blocks(
            a, b_t, block_m=block_m, block_n=block_n,
            out_dtype=out_dtype, interpret=interpret, c=c,
        )
    m, kdim = a.shape
    n, k2 = b_t.shape
    assert kdim == k2 and kdim % bs == 0
    nb = kdim // bs

    sqa = per_row_block_sums(a)  # [M, nb] int32
    sqb = per_row_block_sums(b_t)  # [N, nb]

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    m_p, n_p = _round_up(m, bm), _round_up(n, bn)
    aq = a.data
    bq = b_t.data
    if m_p != m:
        aq = jnp.pad(aq, ((0, m_p - m), (0, 0)))
        sqa = jnp.pad(sqa, ((0, m_p - m), (0, 0)))
    if n_p != n:
        bq = jnp.pad(bq, ((0, n_p - n), (0, 0)))
        sqb = jnp.pad(sqb, ((0, n_p - n), (0, 0)))

    sa = a.scale.reshape(1, nb)
    za = a.zero_point.reshape(1, nb).astype(jnp.int32)
    sb = b_t.scale.reshape(1, nb)
    zb = b_t.zero_point.reshape(1, nb).astype(jnp.int32)
    if c is not None:
        assert c.shape == (m, n), (c.shape, m, n)
        if (m_p, n_p) != (m, n):
            c = jnp.pad(c, ((0, m_p - m), (0, n_p - n)))
    c_in = [] if c is None else [c]

    kernel = functools.partial(_comp_kernel, bs=bs, has_c=c is not None)
    out = pl.pallas_call(
        kernel,
        grid=(m_p // bm, n_p // bn, nb),
        in_specs=[
            pl.BlockSpec((bm, bs), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bs), lambda i, j, k: (j, k)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sa [1, nb]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # za
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sb
            pl.BlockSpec(memory_space=pltpu.SMEM),  # zb
            pl.BlockSpec((bm, nb), lambda i, j, k: (i, 0)),  # sqa
            pl.BlockSpec((bn, nb), lambda i, j, k: (j, 0)),  # sqb
        ] + (
            [pl.BlockSpec((bm, bn), lambda i, j, k: (i, j))]
            if c is not None else []
        ),
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * kdim,
            bytes_accessed=int(aq.size + bq.size + m_p * n_p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(aq, bq, sa, za, sb, zb, sqa, sqb, *c_in)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Dynamic W8A8: runtime per-row activation quant, int8 MXU, ONE output pass
# ---------------------------------------------------------------------------


def unpack_int4_tile_int8(qtile: jnp.ndarray, bk: int) -> jnp.ndarray:
    """Group-planar int4 unpack to INT8 (for the int8 MXU): packed
    [R, bk//2] → int8 [R, bk].  Same layout as :func:`unpack_int4_tile`;
    int32→int8 vector casts DO lower (verified on v5e), unlike 8-bit
    arithmetic."""
    groups = []
    for base in range(0, bk, 256):
        g = min(256, bk - base)
        wide = qtile[:, base // 2 : (base + g) // 2].astype(jnp.int32)
        groups.append(((wide & 0xF) - 8).astype(jnp.int8))
        groups.append((((wide >> 4) & 0xF) - 8).astype(jnp.int8))
    return jnp.concatenate(groups, axis=1)


def _dyn_kernel(qa_ref, qb_ref, sa_ref, rs_ref, sbt_ref, zbt_ref,
                *rest, bits, bk, has_c=False):
    if has_c:
        c_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if bits == 4:
        w = unpack_int4_tile_int8(qb_ref[...], bk)  # int8 on the fly
    else:
        w = qb_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        qa_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # pure int8 MXU; int32 accumulation in VMEM

    @pl.when(ki == nk - 1)
    def _store():
        # ONE scale/compensation pass over the output tile (vs per-k-block
        # in compensated_matmul): out = s_a[m]·s_b[n]·(Σqa·qb − zp_b[n]·Σqa)
        out = acc_ref[...].astype(jnp.float32)
        out = out - rs_ref[...] * zbt_ref[...]
        out = out * (sa_ref[...] * sbt_ref[...])
        if has_c:
            out = out + c_ref[...].astype(jnp.float32)  # loadPreviousC
        out_ref[...] = out.astype(out_ref.dtype)


def dynamic_quantized_matmul(
    a: jnp.ndarray,
    b_t: QuantizedTensor,
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 1024,
    out_dtype: Optional[jnp.dtype] = None,
    c: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Dynamic W8A8 GEMM: float A [M, K] × int8 Bᵀ [N, K] → [M, N].

    ``c``: optional [M, N] accumulate-into-C (``loadPreviousC``) added in
    fp32 during the single output pass.

    A is quantized per row on the fly (int8 symmetric, absmax/127 — the
    runtime-activation-quantization analog of the reference's
    ``GEMMRuntimeQuantization`` rowwise kernels) so the MXU runs pure
    int8×int8→int32 with int32 VMEM accumulation; scales and the weight
    zero-point compensation are applied in ONE pass over the output tile.
    This is the serving GEMM: ``quantized_matmul``'s dequant-on-load costs
    O(N·K) VPU work that dominates at decode shapes (small M), while here
    the VPU cost is O(M·K) quantize + O(M·N) scale — measured ~4× faster
    at M=128, N=K=8192 (docs/perf_notes.md).

    Requires int8 or packed-int4 B with ROW (per-output-channel) or
    TENSOR scales; any strategy (the zero point is compensated exactly via
    Σ_k qa).  int4 payloads unpack to int8 in-kernel (group-planar, K %
    256 == 0) before the MXU dot — W4A8 at half the weight bandwidth.
    """
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()
    cfg = b_t.config
    if cfg.bits not in (8, 4):
        raise ValueError("dynamic_quantized_matmul requires int8/int4 weights")
    if cfg.granularity not in (QuantGranularity.ROW, QuantGranularity.TENSOR):
        raise ValueError(
            "dynamic_quantized_matmul needs ROW or TENSOR weight scales "
            "(per-K-block scales need the compensated/blockwise path)"
        )
    m, kdim = a.shape
    n, k2 = b_t.shape
    assert kdim == k2, (kdim, k2)
    out_dtype = out_dtype or jnp.float32

    # Runtime per-row symmetric activation quantization (exact scales).
    af = a.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(af), axis=1, keepdims=True)
    sa = jnp.maximum(absmax, 1e-12) / 127.0
    qa = jnp.clip(jnp.round(af / sa), -127, 127).astype(jnp.int8)
    rs = jnp.sum(qa.astype(jnp.int32), axis=1, keepdims=True).astype(
        jnp.float32
    )

    if cfg.granularity == QuantGranularity.ROW:
        sb = b_t.scale.reshape(n, 1).astype(jnp.float32)
        zb = b_t.zero_point.reshape(n, 1).astype(jnp.float32)
    else:
        sb = jnp.broadcast_to(
            b_t.scale.reshape(1, 1).astype(jnp.float32), (n, 1)
        )
        zb = jnp.broadcast_to(
            b_t.zero_point.reshape(1, 1).astype(jnp.float32), (n, 1)
        )

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(kdim, 128))
    if cfg.bits == 4:
        # Group-planar packing unpacks in 256-element groups.
        bk = _round_up(bk, 256)
        if kdim % 256 != 0:
            raise ValueError(
                f"int4 dynamic GEMM requires K % 256 == 0 (got K={kdim})"
            )
    m_p, n_p, k_p = _round_up(m, bm), _round_up(n, bn), _round_up(kdim, bk)
    qb = b_t.data  # [N, K] int8 or [N, K//2] packed uint8
    pk_p = k_p // 2 if cfg.bits == 4 else k_p
    if (m_p, k_p) != (m, kdim):
        qa = jnp.pad(qa, ((0, m_p - m), (0, k_p - kdim)))
        sa = jnp.pad(sa, ((0, m_p - m), (0, 0)), constant_values=1.0)
        rs = jnp.pad(rs, ((0, m_p - m), (0, 0)))
    if (n_p, pk_p) != qb.shape:
        qb = jnp.pad(
            qb, ((0, n_p - n), (0, pk_p - qb.shape[1])),
            constant_values=0x88 if cfg.bits == 4 else 0,
        )
        sb = jnp.pad(sb, ((0, n_p - n), (0, 0)), constant_values=1.0)
        zb = jnp.pad(zb, ((0, n_p - n), (0, 0)))
    sbt = jnp.transpose(sb)  # [1, N]
    zbt = jnp.transpose(zb)
    if c is not None:
        assert c.shape == (m, n), (c.shape, m, n)
        if (m_p, n_p) != (m, n):
            c = jnp.pad(c, ((0, m_p - m), (0, n_p - n)))
    c_in = [] if c is None else [c]

    payload_bk = bk // 2 if cfg.bits == 4 else bk
    out = pl.pallas_call(
        functools.partial(
            _dyn_kernel, bits=cfg.bits, bk=bk, has_c=c is not None
        ),
        grid=(m_p // bm, n_p // bn, k_p // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, payload_bk), lambda i, j, k: (j, k)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ] + (
            [pl.BlockSpec((bm, bn), lambda i, j, k: (i, j))]
            if c is not None else []
        ),
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * k_p,
            bytes_accessed=int(qa.size + qb.size + m_p * n_p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qa, qb, sa, rs, sbt, zbt, *c_in)
    return out[:m, :n]
