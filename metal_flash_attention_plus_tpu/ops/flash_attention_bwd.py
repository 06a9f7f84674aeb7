"""Flash-attention backward Pallas kernels (dQ-parallel + dK/dV-parallel).

TPU-native redesign of the reference's "7-GEMM fully-parallel backward"
(``README.md:140-189``; generated kernels ``AttentionKernel+Source.swift:418-511``):
two kernels with *disjoint* output ownership — no atomics, which is exactly
the right shape for TPU too:

- ``backwardQuery``  → :func:`_dq_kernel`: parallel over Q blocks, traverses
  KV; recomputes P = exp(S − L) from the saved logsumexp, computes
  dP = dO·Vᵀ, dS = P⊙(dP − D), accumulates dQ += dS·K.
- ``backwardKeyValue`` → :func:`_dkv_kernel`: parallel over KV blocks,
  traverses Q (and, under GQA, the Q heads of the group — the reduction the
  reference does host-side by dispatch, ``MultiHeadAttention.swift:652-705``);
  computes Sᵀ = K·Qᵀ directly (no transposes in memory), accumulates
  dV += Pᵀ·dO and dK += dSᵀ·Q.

D = rowsum(dO ⊙ O) is precomputed once in XLA and shared by both kernels
(same factoring as the reference's separate computeD pass,
``AttentionKernel+Softmax.swift:31-236``).

Masking reuses the forward's unified per-row range machinery; the dKV
kernel consumes the *transposed* live-tile table (steps ordered by KV
block, traversing group × Q-blocks).  L and D are fed in two layouts to
avoid in-kernel relayouts: lane-replicated columns [B,H,S,128] for the dQ
kernel, row vectors [B,H,1,S] for the dKV kernel.

Scale handling: Q arrives pre-scaled by the softmax scale (wrapper), so
S = Q_s·Kᵀ is already scaled; dK = dSᵀ·Q_s needs no extra factor, while
dQ accumulates dS·K and multiplies by scale once at store.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_plus_tpu.ops.flash_attention import (
    FLAG_BOUNDARY,
    FLAG_DUMMY,
    FLAG_FIRST,
    FLAG_LAST,
    LANES,
    NEG_INF,
    BlockSizes,
    StepTable,
    _round_up,
    build_step_flags,
    build_step_table,
    compute_row_ranges,
)
from metal_flash_attention_plus_tpu.attention.masking import (
    MaskKind,
    MaskSpec,
    FULL,
)
from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
    dequant_kv_tile as _dequant_kv_tile,
)
from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor


def _precision_for(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


# ---------------------------------------------------------------------------
# dQ kernel — parallel over Q blocks, traverse KV (reference backwardQuery).
# ---------------------------------------------------------------------------


def _dq_kernel(
    si_ref,
    sj_ref,
    flags_ref,
    *refs,
    block_q: int,
    block_kv: int,
    head_dim: int,
    scale: float,
    has_mask: bool,
    has_bias: bool,
    want_dbias: bool,
    kv_bits: Optional[int],
    precision,
):
    if has_mask:
        rs_ref, re_ref = refs[:2]
        refs = refs[2:]
    if kv_bits is None:
        q_ref, k_ref, v_ref, do_ref, l_ref, d_ref = refs[:6]
        refs = refs[6:]
    else:
        # Quantized K/V: payload + per-token scale/zp, dequantized on tile
        # load (QuantizedAttention.swift:1188-1228's in-kernel equivalent).
        (q_ref, kq_ref, ks_ref, kz_ref, vq_ref, vs_ref, vz_ref,
         do_ref, l_ref, d_ref) = refs[:10]
        refs = refs[10:]
    if has_bias:
        bias_ref = refs[0]
        refs = refs[1:]
    if want_dbias:
        _zeros_ref = refs[0]  # aliased into dbias; unvisited tiles stay 0
        dq_ref, dbias_ref, dq_acc = refs[1:]
    else:
        dq_ref, dq_acc = refs

    t = pl.program_id(2)
    j = sj_ref[t]
    flags = flags_ref[t]
    is_dummy = (flags & FLAG_DUMMY) != 0

    @pl.when((flags & (FLAG_FIRST | FLAG_DUMMY)) == FLAG_FIRST)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(jnp.logical_not(is_dummy))
    def _compute():
        q = q_ref[0, 0]  # [bq, D] pre-scaled
        if kv_bits is None:
            k = k_ref[0, 0]  # [bkv, D]
        else:
            k = _dequant_kv_tile(
                kq_ref, ks_ref, kz_ref, block_kv, head_dim, kv_bits, q.dtype
            )
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        if has_bias:
            s += bias_ref[0, 0].astype(jnp.float32)

        l = l_ref[0, 0]  # [bq, 128] lane-replicated
        d = d_ref[0, 0]
        l_wide = pltpu.repeat(l, block_kv // LANES, axis=1)
        p = jnp.exp(s - l_wide)
        if has_mask:
            def _masked(p):
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                    + j * block_kv
                )
                keep = jnp.logical_and(col >= rs_ref[...], col < re_ref[...])
                return jnp.where(keep, p, 0.0)

            p = jax.lax.cond(
                (flags & FLAG_BOUNDARY) != 0, _masked, lambda p: p, p
            )

        do = do_ref[0, 0]  # [bq, D]
        if kv_bits is None:
            v = v_ref[0, 0]  # [bkv, D]
        else:
            v = _dequant_kv_tile(
                vq_ref, vs_ref, vz_ref, block_kv, head_dim, kv_bits, q.dtype
            )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        d_wide = pltpu.repeat(d, block_kv // LANES, axis=1)
        ds = p * (dp - d_wide)
        if want_dbias:
            dbias_ref[0, 0] = ds.astype(dbias_ref.dtype)
        dq_acc[...] += jax.lax.dot(
            ds.astype(k.dtype), k,
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when((flags & (FLAG_LAST | FLAG_DUMMY)) == FLAG_LAST)
    def _store():
        dq_ref[0, 0] = (dq_acc[...] * scale).astype(dq_ref.dtype)

    @pl.when(is_dummy)
    def _store_zero():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])
        if want_dbias:
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])


# ---------------------------------------------------------------------------
# dK/dV kernel — parallel over KV blocks, traverse (group × Q blocks).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KVStepTable:
    """Transposed schedule: steps ordered by KV block, then Q-head-in-group,
    then Q block; plus per-(i) full-live bounds (shared with forward)."""

    step_i: np.ndarray  # q block
    step_j: np.ndarray  # kv block
    step_g: np.ndarray  # q-head index within the GQA group
    first: np.ndarray
    last: np.ndarray
    dummy: np.ndarray
    max_start: np.ndarray
    min_end: np.ndarray

    @property
    def num_steps(self) -> int:
        return len(self.step_i)


def build_kv_step_table(
    row_ranges: np.ndarray,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    group: int,
) -> KVStepTable:
    fwd = build_step_table(row_ranges, block_q, block_kv)
    ni = row_ranges.shape[0] // block_q
    live = np.zeros((ni, num_kv_blocks), dtype=bool)
    for i, j, dm in zip(fwd.step_i, fwd.step_j, fwd.dummy):
        if not dm:
            live[i, j] = True

    si, sj, sg, first, last, dummy = [], [], [], [], [], []
    for j in range(num_kv_blocks):
        rows = np.nonzero(live[:, j])[0]
        if rows.size == 0:
            si.append(0)
            sj.append(j)
            sg.append(0)
            first.append(1)
            last.append(1)
            dummy.append(1)
            continue
        steps = [(g, i) for g in range(group) for i in rows]
        for idx, (g, i) in enumerate(steps):
            si.append(i)
            sj.append(j)
            sg.append(g)
            first.append(1 if idx == 0 else 0)
            last.append(1 if idx == len(steps) - 1 else 0)
            dummy.append(0)
    return KVStepTable(
        step_i=np.asarray(si, np.int32),
        step_j=np.asarray(sj, np.int32),
        step_g=np.asarray(sg, np.int32),
        first=np.asarray(first, np.int32),
        last=np.asarray(last, np.int32),
        dummy=np.asarray(dummy, np.int32),
        max_start=fwd.max_start,
        min_end=fwd.min_end,
    )


def _dkv_kernel(
    si_ref,
    sj_ref,
    sg_ref,
    flags_ref,
    *refs,
    block_q: int,
    block_kv: int,
    head_dim: int,
    has_mask: bool,
    has_bias: bool,
    precision,
):
    if has_mask:
        rs_ref, re_ref = refs[:2]  # row vectors [1, bq]
        refs = refs[2:]
    q_ref, k_ref, v_ref, do_ref, l_ref, d_ref = refs[:6]
    refs = refs[6:]
    if has_bias:
        biasT_ref = refs[0]
        refs = refs[1:]
    dk_ref, dv_ref, dk_acc, dv_acc = refs

    t = pl.program_id(2)
    j = sj_ref[t]
    flags = flags_ref[t]
    is_dummy = (flags & FLAG_DUMMY) != 0

    @pl.when((flags & (FLAG_FIRST | FLAG_DUMMY)) == FLAG_FIRST)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(jnp.logical_not(is_dummy))
    def _compute():
        k = k_ref[0, 0]  # [bkv, D]
        q = q_ref[0, 0]  # [bq, D] pre-scaled
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [bkv, bq] = Sᵀ
        if has_bias:
            st += biasT_ref[0, 0].astype(jnp.float32)

        l_row = l_ref[0, 0]  # [1, bq]
        d_row = d_ref[0, 0]
        pt = jnp.exp(st - l_row)
        if has_mask:
            def _masked(pt):
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0)
                    + j * block_kv
                )
                keep = jnp.logical_and(col >= rs_ref[...], col < re_ref[...])
                return jnp.where(keep, pt, 0.0)

            pt = jax.lax.cond(
                (flags & FLAG_BOUNDARY) != 0, _masked, lambda pt: pt, pt
            )

        do = do_ref[0, 0]  # [bq, D]
        v = v_ref[0, 0]  # [bkv, D]
        dv_acc[...] += jax.lax.dot(
            pt.astype(do.dtype), do,
            preferred_element_type=jnp.float32, precision=precision,
        )
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [bkv, bq]
        dst = pt * (dpt - d_row)
        dk_acc[...] += jax.lax.dot(
            dst.astype(q.dtype), q,
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when((flags & (FLAG_LAST | FLAG_DUMMY)) == FLAG_LAST)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)

    @pl.when(is_dummy)
    def _store_zero():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def flash_attention_backward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    l: jnp.ndarray,
    do: jnp.ndarray,
    *,
    mask: MaskSpec = FULL,
    mask_ranges: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
    interpret: Optional[bool] = None,
    compute_dbias: bool = False,
):
    """Backward pass from saved (o, l) residuals.

    Returns (dq, dk, dv, dbias) — dbias is None unless ``compute_dbias``
    and ``bias is not None``.  dk/dv are reduced over the GQA group by the
    dKV kernel itself (the group is part of its traversal schedule).

    ``k``/``v`` may be per-token/per-tensor QuantizedTensors: the dQ kernel
    then dequantizes tiles on load (the reference's quantized backward also
    reuses the core kernels with dequant-on-load,
    ``QuantizedAttention.swift:1188-1228``) and the dK/dV kernel is SKIPPED
    entirely — quantized operands are data, their cotangents are zero, so
    the quantized backward is half the work.  Returns (dq, None, None,
    dbias) in that case.
    """
    kv_quant = isinstance(k, QuantizedTensor)
    if kv_quant:
        assert isinstance(v, QuantizedTensor) and k.config.bits == v.config.bits
        kv_bits = k.config.bits
    else:
        kv_bits = None
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    group = hq // hkv
    precision = _precision_for(q.dtype)

    bq_dq = min(block_sizes.block_q_dq, _round_up(sq, 128))
    bkv_dq = min(block_sizes.block_kv_dq, _round_up(skv, 128))
    bq_dkv = min(block_sizes.block_q_dkv, _round_up(sq, 128))
    bkv_dkv = min(block_sizes.block_kv_dkv, _round_up(skv, 128))
    sq_p = _round_up(sq, int(np.lcm(bq_dq, bq_dkv)))
    skv_p = _round_up(skv, int(np.lcm(bkv_dq, bkv_dkv)))

    # Pre-scale Q once (same convention as forward).
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

    def pad_seq(x, target, axis=2):
        if x.shape[axis] == target:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, pads)

    qs = pad_seq(qs, sq_p)
    do_p = pad_seq(do.astype(q.dtype), sq_p)
    o_p = pad_seq(o, sq_p)
    if kv_quant:
        from metal_flash_attention_plus_tpu.ops.quantized_attention import (
            _per_token_params,
        )

        ks_, kz_ = _per_token_params(k)
        vs_, vz_ = _per_token_params(v)
        kq_p = pad_seq(k.data, skv_p)
        vq_p = pad_seq(v.data, skv_p)
        ks_p = pad_seq(ks_, skv_p)
        kz_p = pad_seq(kz_, skv_p)
        vs_p = pad_seq(vs_, skv_p)
        vz_p = pad_seq(vz_, skv_p)
        pd = kq_p.shape[-1]
    else:
        k_p = pad_seq(k, skv_p)
        v_p = pad_seq(v, skv_p)
    if bias is not None:
        bias = jnp.pad(
            bias,
            [(0, 0), (0, 0), (0, sq_p - bias.shape[2]), (0, skv_p - bias.shape[3])],
        )

    # D = rowsum(dO ⊙ O), fp32 (computeD analog).  L/D in both layouts.
    di = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # [B,Hq,Sq]
    l_p = pad_seq(l, sq_p, axis=2)
    # Padded rows: l = -inf would make exp(s - l) = inf in unmasked lanes;
    # the mask machinery zeroes them, but keep l finite to avoid inf*0.
    l_safe = jnp.where(jnp.isneginf(l_p), 0.0, l_p)
    di_p = pad_seq(di, sq_p, axis=2)
    l_col = jnp.broadcast_to(l_safe[..., None], (b, hq, sq_p, LANES))
    d_col = jnp.broadcast_to(di_p[..., None], (b, hq, sq_p, LANES))
    l_row = l_safe[:, :, None, :]  # [B,Hq,1,Sq]
    d_row = di_p[:, :, None, :]

    has_mask = mask.kind != MaskKind.NONE or skv_p != skv or sq_p != sq
    row_ranges = compute_row_ranges(
        mask, sq, skv, mask_ranges=mask_ranges,
        seq_q_padded=sq_p, seq_kv_cap=skv,
    )

    def kv_head(h):
        return (h % hkv) if interleaved_kv else (h // group)

    def q_head(h, g):
        # inverse mapping for the dKV kernel: g-th q head of kv head h
        return (g * hkv + h) if interleaved_kv else (h * group + g)

    # ----- dQ kernel -----
    table = build_step_table(row_ranges, bq_dq, bkv_dq)
    in_specs = []
    inputs = []
    if has_mask:
        in_specs += [
            pl.BlockSpec((bq_dq, 1), lambda bi, h, t, si, sj, *_: (si[t], 0)),
            pl.BlockSpec((bq_dq, 1), lambda bi, h, t, si, sj, *_: (si[t], 0)),
        ]
        inputs += [
            jnp.asarray(row_ranges[:, 0:1]),
            jnp.asarray(row_ranges[:, 1:2]),
        ]
    def kv_spec(width):
        return pl.BlockSpec(
            (1, 1, bkv_dq, width),
            lambda bi, h, t, si, sj, *_: (bi, kv_head(h), sj[t], 0),
        )

    q_spec = pl.BlockSpec(
        (1, 1, bq_dq, d), lambda bi, h, t, si, sj, *_: (bi, h, si[t], 0)
    )
    stat_spec = pl.BlockSpec(
        (1, 1, bq_dq, LANES), lambda bi, h, t, si, sj, *_: (bi, h, si[t], 0)
    )
    if kv_quant:
        in_specs += [
            q_spec,
            kv_spec(pd), kv_spec(1), kv_spec(1),
            kv_spec(pd), kv_spec(1), kv_spec(1),
            q_spec, stat_spec, stat_spec,
        ]
        inputs += [qs, kq_p, ks_p, kz_p, vq_p, vs_p, vz_p, do_p, l_col, d_col]
    else:
        in_specs += [
            q_spec, kv_spec(d), kv_spec(d), q_spec, stat_spec, stat_spec,
        ]
        inputs += [qs, k_p, v_p, do_p, l_col, d_col]
    want_dbias = compute_dbias and bias is not None
    if bias is not None:
        bb = bias.shape[0] == 1
        bh = bias.shape[1] == 1
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bq_dq, bkv_dq),
                lambda bi, h, t, si, sj, *_: (
                    0 if bb else bi, 0 if bh else h, si[t], sj[t]
                ),
            )
        )
        inputs.append(bias)

    out_shape = [jax.ShapeDtypeStruct((b, hq, sq_p, d), jnp.float32)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, bq_dq, d), lambda bi, h, t, si, sj, *_: (bi, h, si[t], 0)
        )
    ]
    io_aliases = {}
    if want_dbias:
        out_shape.append(
            jax.ShapeDtypeStruct((b, hq, sq_p, skv_p), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, bq_dq, bkv_dq),
                lambda bi, h, t, si, sj, *_: (bi, h, si[t], sj[t]),
            )
        )
        # Unvisited (fully masked) tiles must read as zero: alias a zeros
        # input so unwritten blocks keep their zero content.
        zeros = jnp.zeros((b, hq, sq_p, skv_p), jnp.float32)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bq_dq, bkv_dq),
                lambda bi, h, t, si, sj, *_: (bi, h, si[t], sj[t]),
            )
        )
        inputs.append(zeros)
        n_prefetch = 3
        io_aliases = {n_prefetch + len(inputs) - 1: 1}

    kernel = functools.partial(
        _dq_kernel,
        block_q=bq_dq,
        block_kv=bkv_dq,
        head_dim=d,
        scale=scale,
        has_mask=has_mask,
        has_bias=bias is not None,
        want_dbias=want_dbias,
        kv_bits=kv_bits,
        precision=precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hq, table.num_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((bq_dq, d), jnp.float32)],
    )
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(
        jnp.asarray(table.step_i),
        jnp.asarray(table.step_j),
        jnp.asarray(build_step_flags(table, bkv_dq, has_mask)),
        *inputs,
    )
    if want_dbias:
        dq, dbias_full = results
        dbias = dbias_full[:, :, :sq, :skv]
        if bias.shape[0] == 1 and b > 1:
            dbias = jnp.sum(dbias, axis=0, keepdims=True)
        if bias.shape[1] == 1 and hq > 1:
            dbias = jnp.sum(dbias, axis=1, keepdims=True)
    else:
        dq = results[0] if isinstance(results, (list, tuple)) else results
        dbias = None
    dq = dq[:, :, :sq, :]

    if kv_quant:
        # Quantized operands are data: no dK/dV (see docstring).
        return dq, None, None, dbias

    # ----- dKV kernel -----
    nj = skv_p // bkv_dkv
    kv_table = build_kv_step_table(
        compute_row_ranges(
            mask, sq, skv, mask_ranges=mask_ranges,
            seq_q_padded=sq_p, seq_kv_cap=skv,
        ),
        bq_dkv,
        bkv_dkv,
        nj,
        group,
    )

    in_specs2 = []
    inputs2 = []
    if has_mask:
        # Row-vector layout [1, Sq]: ranges enter as [1, bq] row tiles.
        in_specs2 += [
            pl.BlockSpec((1, bq_dkv), lambda bi, h, t, si, sj, sg, *_: (0, si[t])),
            pl.BlockSpec((1, bq_dkv), lambda bi, h, t, si, sj, sg, *_: (0, si[t])),
        ]
        inputs2 += [
            jnp.asarray(row_ranges[:, 0][None, :]),
            jnp.asarray(row_ranges[:, 1][None, :]),
        ]
    in_specs2 += [
        pl.BlockSpec(
            (1, 1, bq_dkv, d),
            lambda bi, h, t, si, sj, sg, *_: (bi, q_head(h, sg[t]), si[t], 0),
        ),
        pl.BlockSpec(
            (1, 1, bkv_dkv, d),
            lambda bi, h, t, si, sj, sg, *_: (bi, h, sj[t], 0),
        ),
        pl.BlockSpec(
            (1, 1, bkv_dkv, d),
            lambda bi, h, t, si, sj, sg, *_: (bi, h, sj[t], 0),
        ),
        pl.BlockSpec(
            (1, 1, bq_dkv, d),
            lambda bi, h, t, si, sj, sg, *_: (bi, q_head(h, sg[t]), si[t], 0),
        ),
        pl.BlockSpec(
            (1, 1, 1, bq_dkv),
            lambda bi, h, t, si, sj, sg, *_: (bi, q_head(h, sg[t]), 0, si[t]),
        ),
        pl.BlockSpec(
            (1, 1, 1, bq_dkv),
            lambda bi, h, t, si, sj, sg, *_: (bi, q_head(h, sg[t]), 0, si[t]),
        ),
    ]
    inputs2 += [qs, k_p, v_p, do_p, l_row, d_row]
    if bias is not None:
        biasT = jnp.swapaxes(bias, 2, 3)
        bb = biasT.shape[0] == 1
        bh = biasT.shape[1] == 1
        in_specs2.append(
            pl.BlockSpec(
                (1, 1, bkv_dkv, bq_dkv),
                lambda bi, h, t, si, sj, sg, *_: (
                    0 if bb else bi,
                    0 if bh else q_head(h, sg[t]),
                    sj[t],
                    si[t],
                ),
            )
        )
        inputs2.append(biasT)

    kernel2 = functools.partial(
        _dkv_kernel,
        block_q=bq_dkv,
        block_kv=bkv_dkv,
        head_dim=d,
        has_mask=has_mask,
        has_bias=bias is not None,
        precision=precision,
    )
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, hkv, kv_table.num_steps),
        in_specs=in_specs2,
        out_specs=[
            pl.BlockSpec(
                (1, 1, bkv_dkv, d),
                lambda bi, h, t, si, sj, sg, *_: (bi, h, sj[t], 0),
            ),
            pl.BlockSpec(
                (1, 1, bkv_dkv, d),
                lambda bi, h, t, si, sj, sg, *_: (bi, h, sj[t], 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv_dkv, d), jnp.float32),
            pltpu.VMEM((bkv_dkv, d), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        kernel2,
        grid_spec=grid_spec2,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, skv_p, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(kv_table.step_i),
        jnp.asarray(kv_table.step_j),
        jnp.asarray(kv_table.step_g),
        jnp.asarray(build_step_flags(kv_table, bkv_dkv, has_mask)),
        *inputs2,
    )
    dk = dk[:, :, :skv, :]
    dv = dv[:, :, :skv, :]
    return dq, dk, dv, dbias
