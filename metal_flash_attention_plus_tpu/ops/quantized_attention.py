"""Quantized flash attention — INT8 / packed-INT4 K/V with dequant-on-load.

TPU-native redesign of the reference's ``QuantizedAttention`` compute path
(``Attention/QuantizedAttention.swift:135-263`` — quantized operands bound
with scale/zero-point pairs; dequantization happens inside the tile load,
``GEMMHeaders.swift:678-808`` ``load_quantized_int8/int4``; flash math runs
in float registers):

- K and V live in HBM at integer width (the bandwidth win — KV-cache reads
  dominate long-context attention).  Tiles are widened and scaled on the
  VPU inside the kernel; the MXU runs at the float precision of Q.
- Granularities: per-token (ROW over the head dim — the production KV-cache
  choice), TENSOR (expanded to per-token on the host: Skv floats per head,
  negligible), and BLOCK_2D (block_rows × block_size 2D blocks — the
  reference's per-8×8-tile lookup, ``AttentionKernel+Accumulate.swift:
  451-511``) whose scale tiles are expanded IN-KERNEL on the MXU via 0/1
  block-diagonal dots (``ops.quantized_gemm.dequant_kv_tile_block2d``).
- Q stays float by default, as in the reference's production path
  (blockwise-Q is rejected with a per-tensor fallback there too,
  ``QuantizedAttention.swift:588-648``).  For QAT, fake-quantize Q with
  ``quant.ste.fake_quantize``.  ``quantize_q=True`` additionally
  quantizes Q per token (int8 symmetric, softmax scale folded into the
  scales exactly) so scores run int8×int8→int32 on the MXU — measured
  +8% at d=256, a slight loss at d=64 (docs/perf_notes.md); requires
  zero-point-free (SYMMETRIC) int8 K.  With per-channel/TENSOR symmetric
  V the FULL-INTEGER pipeline also runs P×V in int8 (``int8_pv``).
- Backward runs BOTH dequantizing kernels (dQ and dKV) with the same
  in-kernel dequant-on-load (the reference likewise reuses the core flash
  kernels with dequantizing loads, ``QuantizedAttention.swift:1012-1181``);
  ``quantized_flash_attention`` returns dq plus EXACT scale/zero-point
  cotangents for K/V (integer payloads stay float0), and
  ``quantized_flash_attention_qat`` provides the STE path to float
  masters.

The mask zoo / GQA / L conventions are identical to ops/flash_attention.py
(same step-table machinery).
"""

from __future__ import annotations

import os
import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_plus_tpu.attention.masking import (
    DEFAULT_MASK_VALUE,
    FULL,
    MaskKind,
    MaskSpec,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    LANES,
    _interpret_two_level,
    LN2 as _LN2,
    LOG2E as _LOG2E,
    NEG_INF,
    BlockSizes,
    _round_up,
    build_block_bounds,
    build_packed_schedule,
    compute_row_ranges,
    resolve_mask_mode,
)
from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
    block2d_expanders,
    dequant_kv_tile as _dequant_kv_tile,
    dequant_kv_tile_block2d as _dequant_block2d,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor

LOG2_127 = float(np.log2(127.0))
LN_127 = float(np.log(127.0))


def _qfwd_kernel(
    # scalar prefetch: (lo, hi, loi, hii) per q-block (major + inner);
    # packed prepends (q0, q1, n0, t)
    *all_refs,
    block_q: int,
    block_kv: int,  # INNER compute tile
    n_inner: int,  # subtiles per grid step (major = n_inner * block_kv)
    head_dim: int,
    dv: int,  # PV width (= round_up(d, 128) in ones mode)
    mask_mode: str,
    affine,
    has_bias: bool,
    mask_value: float,
    bits_k: int,
    bits_v: int,
    quantize_q: bool,
    precision,
    compute_dtype,
    kv_gran: str = "token",  # "token" (ROW/TENSOR) | "block2d"
    has_er: bool = False,  # block2d with block_rows > 1
    has_rowstats: bool = False,  # ranges mode: (ms, me) prefetch arrays
    inner_skip: bool = False,
    ones: bool = False,
    packed: bool = False,
    int8_pv: bool = False,  # full-integer pipeline: int8 P × int8 V MXU dot
    ks_folded: bool = False,  # TENSOR K scale folded into the Q scales
    kv_folded: bool = False,  # dequant-free: bf16×int8 MIXED MXU dots
    k_rowscale: bool = False,  # folded + per-token K: one score col-multiply
    v_rowscale: bool = False,  # folded + per-token V: one P col-multiply
    skip_row_guard: bool = False,  # every row statically live: skip store guard
    lean: bool = False,  # dense grid, no scalar prefetch (FULL/no-mask)
):
    # Two-level schedule + ones-fused rowsum + base-2 softmax — same
    # round-2 structure as flash_attention._fwd_kernel (see its docstring
    # and docs/perf_notes.md); dequantization happens per INNER subtile on
    # slices of the major payload/scale tiles.
    has_mask = mask_mode != "none"
    if lean:
        # LEAN dense schedule for UNMASKED problems (round-4, exp33): no
        # scalar-prefetch tables, plain program-id arithmetic, reciprocal
        # epilogue — see flash_attention._fwd_kernel's lean branch.
        refs = all_refs
        row_block = pl.program_id(2)
        j = pl.program_id(3)
        jj = j
        live = None
        init_cond = j == 0
        store_cond = j == pl.num_programs(3) - 1
        kvj = j
        loi = hii = None
    elif packed:
        # Packed-pair schedule (see flash_attention.build_packed_schedule):
        # two contiguous q-block segments per grid row, zero dead steps for
        # causal.
        (q0_ref, q1_ref, n0_ref, t_ref,
         lo_ref, hi_ref, loi_ref, hii_ref) = all_refs[:8]
        refs = all_refs[8:]
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
    if not lean:
        kvj = lo + jj
        loi = loi_ref[row_block]
        hii = hii_ref[row_block]
    if has_rowstats:
        # All-rows-live [ms, me) per q-block (ranges-mode interior fast
        # path — see _fwd_kernel's dual-path block).
        ms_ref, me_ref = refs[0], refs[1]
        refs = refs[2:]
    if mask_mode == "ranges":
        rs_ref, re_ref = refs[0], refs[1]
        refs = refs[2:]
    if quantize_q and int8_pv:
        # FULL-INTEGER pipeline (the TPU realization of the reference's
        # "INT8 = 2.5× faster" headline, ``README.md:291-296``): BOTH MXU
        # dots run int8×int8→int32 at 2× the bf16 MXU rate.  Scores as in
        # quantize_q below; P is rounded to int8 in 1/127 units straight
        # out of the exp2 (the ×127 folds into the exponent constant), and
        # V stays integer through the PV dot — its per-CHANNEL (or TENSOR)
        # scales fold out of the matmul and multiply the accumulator ONCE
        # at store (O = (P·V_int)·diag(vs); the 127 cancels against the
        # P-unit rowsum in the softmax denominator).
        if ks_folded:
            (q_ref, qs_ref, kq_ref, vq_ref, vsc_ref) = refs[:5]
            refs = refs[5:]
            ksr_ref = None
        else:
            (q_ref, qs_ref, kq_ref, ksr_ref, vq_ref, vsc_ref) = refs[:6]
            refs = refs[6:]
    elif quantize_q:
        # Activation quantization: Q arrives int8 with per-token scales
        # (softmax scale folded into them) and K stays int8 — the S matmul
        # runs int8×int8→int32 on the MXU at 2× the bf16 rate; per-row ×
        # per-col scales reconstruct the float scores exactly afterwards.
        # K scales arrive TRANSPOSED ([1, bkv] row tiles) so no in-kernel
        # relayout is needed for the column broadcast.
        if ks_folded:
            (q_ref, qs_ref, kq_ref, vq_ref, vs_ref, vz_ref) = refs[:6]
            refs = refs[6:]
            ksr_ref = None
        else:
            (q_ref, qs_ref, kq_ref, ksr_ref,
             vq_ref, vs_ref, vz_ref) = refs[:7]
            refs = refs[7:]
    elif kv_folded:
        # Dequant-free fast path: TENSOR/CHANNEL K scales are folded into
        # the Q pre-scale host-side and TENSOR/CHANNEL V scales fold at
        # store, so the int payloads feed the MXU directly via MIXED
        # bf16×int8 dots — zero per-tile dequant VPU work, half/quarter
        # the KV DMA of the bf16 kernel.  Per-token (ROW) scales arrive
        # TRANSPOSED as [1, bkv_major] row tiles instead: K costs ONE
        # score column-multiply, V one P column-multiply (after the
        # rowsum) — still no dequant pass over the payload.
        q_ref, kq_ref = refs[:2]
        refs = refs[2:]
        if k_rowscale:
            ksr_ref = refs[0]
            refs = refs[1:]
        vq_ref = refs[0]
        refs = refs[1:]
        if v_rowscale:
            vsr_ref = refs[0]
            refs = refs[1:]
            vsc_ref = None
        else:
            vsc_ref = refs[0]
            refs = refs[1:]
    else:
        (q_ref, kq_ref, ks_ref, kz_ref, vq_ref, vs_ref, vz_ref) = refs[:7]
        refs = refs[7:]
        if kv_gran == "block2d":
            if has_er:
                er_ref, ec_ref = refs[:2]
                refs = refs[2:]
            else:
                er_ref, ec_ref = None, refs[0]
                refs = refs[1:]
    if has_bias:
        bias_ref = refs[0]
        refs = refs[1:]
    if ones:
        o_ref, l_ref, m_scr, acc_scr = refs
        l_scr = None
    else:
        o_ref, l_ref, m_scr, l_scr, acc_scr = refs

    @pl.when(init_cond)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        if not ones:
            l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _inner(t, masked):
        sl = pl.ds(t * block_kv, block_kv)
        if quantize_q:
            k_int = kq_ref[0, 0, sl, :]
            if bits_k == 4:
                from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                    unpack_int4_tile_int8,
                )

                k_int = unpack_int4_tile_int8(k_int, head_dim)
            s_int = jax.lax.dot_general(
                q_ref[0, 0], k_int, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # pure int8 MXU
            # scores = s_int · q_scale[row] · k_scale[col]  (zp-free:
            # activation quant is per-token symmetric; log2e folded into
            # the Q scales by the wrapper — base-2 softmax).  With a
            # TENSOR K scale it is folded into the Q scales on the host
            # (ks_folded) and the column multiply disappears.
            s = s_int.astype(jnp.float32) * qs_ref[0, 0]
            if not ks_folded:
                s = s * ksr_ref[0, 0, :, sl]
        elif kv_folded:
            # MIXED bf16×int8 score dot — Mosaic feeds int8 K straight to
            # the MXU (exact; no convert pass, no scale multiply).  int4
            # payloads nibble-unpack to int8 first (shift/mask only — the
            # scales are already folded into Q).
            k_int = kq_ref[0, 0, sl, :]
            if bits_k == 4:
                from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                    unpack_int4_tile_int8,
                )

                k_int = unpack_int4_tile_int8(k_int, head_dim)
            s = jax.lax.dot_general(
                q_ref[0, 0], k_int, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if k_rowscale:
                # Per-token K scales: one column multiply on the scores
                # (linear — commutes with the log2e fold in Q).
                s = s * ksr_ref[0, 0, :, sl]
        else:
            q = q_ref[0, 0]  # [bq, D] pre-scaled by scale·log2e
            if kv_gran == "block2d":
                from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                    dequant_block2d_vals,
                )

                k = dequant_block2d_vals(
                    kq_ref[0, 0, sl, :],
                    ks_ref[0, 0, pl.ds(
                        t * ks_ref.shape[2] // n_inner,
                        ks_ref.shape[2] // n_inner), :],
                    kz_ref[0, 0, pl.ds(
                        t * kz_ref.shape[2] // n_inner,
                        kz_ref.shape[2] // n_inner), :],
                    None if er_ref is None else er_ref[...],
                    ec_ref[...], head_dim, bits_k, compute_dtype,
                )
            else:
                from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                    dequant_kv_vals,
                )

                k = dequant_kv_vals(
                    kq_ref[0, 0, sl, :], ks_ref[0, 0, sl, :],
                    kz_ref[0, 0, sl, :], head_dim, bits_k, compute_dtype,
                )
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
        inner_idx = kvj * n_inner + t
        if has_bias:
            # Scores are in the log2 domain — convert the additive bias.
            s += bias_ref[0, 0, :, sl].astype(jnp.float32) * _LOG2E
        if masked:
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
                    + row_block * block_q
                )
                keep = jnp.logical_and(
                    col >= jnp.maximum(0, row + a_off),
                    col < jnp.minimum(cap, row + b_off),
                )
                keep = jnp.logical_and(keep, row < seq_q)
            else:
                keep = jnp.logical_and(col >= rs_ref[...], col < re_ref[...])
            s = jnp.where(keep, s, mask_value)

        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        m_wide = pltpu.repeat(m_next, block_kv // LANES, axis=1)
        if int8_pv:
            # P in 1/127 units straight out of the exp2 (the ×127 rides the
            # exponent: exp2(x + log2 127) = 127·exp2(x)); round-to-nearest
            # via +0.5 then truncate (p ≥ 0).  The 127 cancels at store
            # against the P-unit rowsum.
            p127 = jnp.exp2(s + (LOG2_127 - m_wide))
            p_q = (p127 + 0.5).astype(jnp.int32).astype(jnp.int8)
        else:
            p = jnp.exp2(s - m_wide)
        m_scr[...] = m_next

        if int8_pv:
            v_int = vq_ref[0, 0, sl, :]
            if bits_v == 4:
                from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                    unpack_int4_tile_int8,
                )

                v_int = unpack_int4_tile_int8(v_int, head_dim)
                if ones:
                    v_int = jnp.concatenate(
                        [v_int,
                         jnp.ones((block_kv, dv - head_dim), jnp.int8)],
                        axis=1,
                    )
            # (int8 V payloads arrive host-padded with integer ones lanes.)
            pv = jax.lax.dot_general(
                p_q, v_int, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            if ones:
                a_wide = (
                    alpha if dv == LANES
                    else pltpu.repeat(alpha, dv // LANES, axis=1)
                )
                acc_scr[...] = acc_scr[...] * a_wide + pv
            else:
                l_scr[...] = (
                    alpha * l_scr[...]
                    + jnp.sum(p127, axis=1, keepdims=True)
                )
                if head_dim == LANES:
                    acc_scr[...] = acc_scr[...] * alpha + pv
                else:
                    acc_scr[...] = (
                        acc_scr[...]
                        * pltpu.repeat(alpha, head_dim // LANES, axis=1)
                        + pv
                    )
            return

        if kv_folded:
            # MIXED bf16×int8 PV dot; the int8 payload carries host-padded
            # integer ones lanes when `ones` (rowsum in the spare lanes),
            # and the V scales multiply the accumulator once at store.
            # int4 V nibble-unpacks in-kernel and concats its ones there.
            v_int = vq_ref[0, 0, sl, :]
            if bits_v == 4:
                from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                    unpack_int4_tile_int8,
                )

                v_int = unpack_int4_tile_int8(v_int, head_dim)
                if ones:
                    v_int = jnp.concatenate(
                        [v_int,
                         jnp.ones((block_kv, dv - head_dim), jnp.int8)],
                        axis=1,
                    )
            if v_rowscale:
                # Per-token V scales fold into P (O = Σ_t (p_t·s_v[t])·
                # v_int[t,:]) — but the softmax denominator needs the
                # UNSCALED rowsum, so it is accumulated first (the wrapper
                # forces the l_scr path: ones=False when v_rowscale).
                l_scr[...] = (
                    alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
                )
                p = p * vsr_ref[0, 0, :, sl]
            pv = jax.lax.dot_general(
                p.astype(compute_dtype), v_int,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if ones:
                a_wide = (
                    alpha if dv == LANES
                    else pltpu.repeat(alpha, dv // LANES, axis=1)
                )
                acc_scr[...] = acc_scr[...] * a_wide + pv
            else:
                if not v_rowscale:  # v_rowscale accumulated l above
                    l_scr[...] = (
                        alpha * l_scr[...]
                        + jnp.sum(p, axis=1, keepdims=True)
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
            return

        if not quantize_q and kv_gran == "block2d":
            from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                dequant_block2d_vals,
            )

            v = dequant_block2d_vals(
                vq_ref[0, 0, sl, :],
                vs_ref[0, 0, pl.ds(
                    t * vs_ref.shape[2] // n_inner,
                    vs_ref.shape[2] // n_inner), :],
                vz_ref[0, 0, pl.ds(
                    t * vz_ref.shape[2] // n_inner,
                    vz_ref.shape[2] // n_inner), :],
                None if er_ref is None else er_ref[...],
                ec_ref[...], head_dim, bits_v, compute_dtype,
            )
        else:
            from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                dequant_kv_vals,
            )

            v = dequant_kv_vals(
                vq_ref[0, 0, sl, :], vs_ref[0, 0, sl, :],
                vz_ref[0, 0, sl, :], head_dim, bits_v, compute_dtype,
            )
        if ones:
            # ones-fused rowsum: append ones lanes so the PV dot carries
            # rowsum(p) in the spare MXU lanes (see _fwd_kernel).
            v = jnp.concatenate(
                [v, jnp.ones((block_kv, dv - head_dim), v.dtype)], axis=1
            )
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

    else:
        # Splash-style dual path (see _fwd_kernel): a KV slab provably
        # INSIDE the mask skips the per-element mask pass entirely — only
        # diagonal/edge slabs pay the iota/compare/select VPU work.
        c0 = kvj * (n_inner * block_kv)
        c1 = c0 + n_inner * block_kv
        r0 = row_block * block_q
        r1 = r0 + block_q
        if mask_mode == "affine":
            a_off, b_off, seq_q, cap = affine
            fully_live = jnp.logical_and(
                jnp.logical_and(c1 <= r0 + b_off, c0 >= r1 - 1 + a_off),
                jnp.logical_and(r1 <= seq_q, c1 <= cap),
            )
        else:
            fully_live = jnp.logical_and(
                c0 >= ms_ref[row_block], c1 <= me_ref[row_block]
            )

        @pl.when(jnp.logical_and(live, fully_live))
        def _compute_interior():
            _loop(False, guards=False)

        @pl.when(jnp.logical_and(live, jnp.logical_not(fully_live)))
        def _compute_edge():
            _loop(True)

    @pl.when(store_cond)
    def _store():
        if ones:
            acc = acc_scr[...]
            lsum_w = acc[:, head_dim:]
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
            if int8_pv or (kv_folded and not v_rowscale):
                # Fold the per-channel V scales out of the PV dot (one
                # [bq, d] pass per q-row, not per tile); for int8_pv the
                # 127 of the P units cancelled in the division above.
                out = out * vsc_ref[0, 0, :, :head_dim]
            m1 = m_scr[...][:, :1]
            lse1 = jnp.where(
                lsum > 0.0,
                m1 * _LN2 + jnp.log(safe1) - (LN_127 if int8_pv else 0.0),
                NEG_INF,
            )
            lse = jnp.broadcast_to(lse1, (block_q, LANES))
        else:
            lsum = l_scr[...]
            safe = jnp.where(lsum == 0.0, 1.0, lsum)
            if lean:
                # Reciprocal-multiply epilogue (see _fwd_kernel lean).
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
            if int8_pv or (kv_folded and not v_rowscale):
                out = out * vsc_ref[0, 0, :, :head_dim]
            m = m_scr[...]
            lse = jnp.where(
                lsum > 0.0,
                m * _LN2 + jnp.log(safe) - (LN_127 if int8_pv else 0.0),
                NEG_INF,
            )
        if has_mask and not skip_row_guard:
            if mask_mode == "affine":
                a_off, b_off, seq_q, cap = affine
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    + row_block * block_q
                )
                live_rows = jnp.logical_and(
                    row < seq_q,
                    jnp.minimum(cap, row + b_off)
                    > jnp.maximum(0, row + a_off),
                )
            else:
                live_rows = re_ref[...] > rs_ref[...]
            out = jnp.where(live_rows, out, 0.0)
            lse = jnp.where(live_rows, lse, NEG_INF)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        l_ref[0, 0] = lse


def _hpack_kernel(
    q_ref, k1_ref, k2_ref, v1_ref, v2_ref, vsc_ref, o_ref, l_ref,
    m_scr, l_scr, acc_scr, *,
    block_q: int, block_kv: int, n_inner: int, causal: bool, off: int,
    bits_k: int, bits_v: int,
):
    """Head-PAIR-packed folded forward for d = 64 (round 4, exp35).

    d = 64 leaves the 128-deep MXU contraction half-empty (exp28:
    dots-only floor 33% of peak).  Pack two heads per MXU pass:

      Q_cat = [q_h1 | q_h2]              [bq, 128]  (full depth)
      K_bd  = [[k1 | 0], [0 | k2]]       [2bkv, 128] block-diagonal,
              built IN-KERNEL from the two [bkv, 64] payload tiles
              (lane concat with an int8 zero tile — HBM traffic stays
              at real payload bytes)
      S     = Q_cat · K_bdᵀ              [bq, 2bkv]: h1's scores in
              columns [0, bkv), h2's in [bkv, 2bkv)
      softmax per COLUMN-HALF (each row carries TWO heads' queries);
      the m/l scratch packs both heads into the [bq, 128] lanes
      ([0, 64) = h1, [64, 128) = h2) so alpha/epilogue multiplies are
      plain elementwise ops — no repeats, no relayouts.
      V_bd  = [[v1 | 0], [0 | v2]]       [2bkv, 128]
      O_cat = P_cat · V_bd               [bq, 128] = [o_h1 | o_h2]
              (full output lanes; contraction 2bkv).

    Measured +30% over the unpacked causal kernel at d=64
    (docs/perf_notes.md round 4).  Blocks arrive as NATURAL-layout pairs
    via (1, 2, bq, 64) BlockSpecs — no host packing passes.
    """
    i = pl.program_id(2)
    j = pl.program_id(3)
    bkvm = block_kv * n_inner
    nj = pl.num_programs(3)
    if causal:
        hi = jnp.minimum((((i + 1) * block_q + off) + bkvm - 1) // bkvm, nj)
    else:
        hi = nj
    d = 64

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Q arrives HOST-PACKED [bq, 128] (lane-concatenated head pair): a
    # (1, 2, bq, 64) pair-block fetch + in-kernel concat measured ~25%
    # SLOWER (strided half-lane blocks defeat the tile layout); the one
    # host transpose pass is ~10% of Q bytes and amortizes to noise.
    q_cat = q_ref[0, 0]

    def _inner(t, masked):
        sl = pl.ds(t * block_kv, block_kv)
        k1 = k1_ref[0, 0, sl, :]
        k2 = k2_ref[0, 0, sl, :]
        if bits_k == 4:
            from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                unpack_int4_tile_int8,
            )

            k1 = unpack_int4_tile_int8(k1, d)
            k2 = unpack_int4_tile_int8(k2, d)
        z8 = jnp.zeros((block_kv, d), jnp.int8)
        k_bd = jnp.concatenate([
            jnp.concatenate([k1, z8], axis=1),
            jnp.concatenate([z8, k2], axis=1),
        ], axis=0)
        s = jax.lax.dot_general(
            q_cat, k_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, 2bkv]
        if masked:
            c0 = (j * n_inner + t) * block_kv
            col = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 2 * block_kv), 1
            ) % block_kv + c0
            row = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 2 * block_kv), 0
                )
                + i * block_q + off
            )
            s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
        s1 = s[:, :block_kv]
        s2 = s[:, block_kv:]
        m_prev = m_scr[...]
        m_curr = jnp.concatenate([
            jnp.broadcast_to(
                jnp.max(s1, axis=1, keepdims=True), (block_q, d)),
            jnp.broadcast_to(
                jnp.max(s2, axis=1, keepdims=True), (block_q, d)),
        ], axis=1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        m1w = pltpu.repeat(m_next[:, :d], block_kv // d, axis=1)
        m2w = pltpu.repeat(m_next[:, d:], block_kv // d, axis=1)
        # SPLIT PV (round 5, exp43: +3.5%): the PV contraction is bkv,
        # not d, so per-half dots contract the FULL depth — same MXU
        # time as one packed dot, but no block-diagonal V build and no
        # P concat (exp2 runs per half straight into its dot).
        p1 = jnp.exp2(s1 - m1w)
        p2 = jnp.exp2(s2 - m2w)
        l_scr[...] = alpha * l_scr[...] + jnp.concatenate([
            jnp.broadcast_to(
                jnp.sum(p1, axis=1, keepdims=True), (block_q, d)),
            jnp.broadcast_to(
                jnp.sum(p2, axis=1, keepdims=True), (block_q, d)),
        ], axis=1)
        m_scr[...] = m_next
        v1 = v1_ref[0, 0, sl, :]
        v2 = v2_ref[0, 0, sl, :]
        if bits_v == 4:
            from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
                unpack_int4_tile_int8,
            )

            v1 = unpack_int4_tile_int8(v1, d)
            v2 = unpack_int4_tile_int8(v2, d)
        pv1 = jax.lax.dot_general(
            p1.astype(jnp.bfloat16), v1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pv2 = jax.lax.dot_general(
            p2.astype(jnp.bfloat16), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + jnp.concatenate(
            [pv1, pv2], axis=1
        )

    if causal:
        fully_live = (j + 1) * bkvm <= i * block_q + off + 1

        @pl.when(jnp.logical_and(j < hi, fully_live))
        def _interior():
            for t in range(n_inner):
                _inner(t, False)

        @pl.when(jnp.logical_and(j < hi, jnp.logical_not(fully_live)))
        def _edge():
            for t in range(n_inner):
                _inner(t, True)
    else:
        for t in range(n_inner):
            _inner(t, False)

    @pl.when(j == hi - 1)
    def _store():
        lsum = l_scr[...]  # per-lane-half denominators — already aligned
        safe = jnp.where(lsum == 0.0, 1.0, lsum)
        inv = 1.0 / safe
        out = acc_scr[...] * inv * vsc_ref[0, 0]
        # O stays lane-packed [bq, 128] = [o_h1 | o_h2]; the wrapper
        # unpacks with one host transpose (same rationale as Q).
        o_ref[0, 0] = out.astype(o_ref.dtype)
        l_ref[0, 0] = jnp.where(
            lsum > 0.0, m_scr[...] * _LN2 + jnp.log(safe), NEG_INF
        )


def pack_heads(x: jnp.ndarray) -> jnp.ndarray:
    """Lane-pack head pairs: [B, H, S, 64] → [B, H/2, S, 128].

    The PACKED LAYOUT public API (round 5): at d=64 the head-pair-packed
    kernel fills the 128-deep MXU contraction (one full-depth pass per
    head pair, exp35), but the per-call pack/unpack transposes eat the
    kernel-level gain at d=64's byte/FLOP ratio (exp37).  Keeping head
    pairs lane-packed ACROSS layers — this layout as a first-class tensor
    format — moves the transposes out of the hot path entirely: in a
    transformer the pack is absorbed into the Q/O projection weight
    layout (a permutation of the H·D axis), so it costs nothing at all
    (models/transformer.py ``packed_d64`` mode).
    """
    b, h, s, d = x.shape
    assert h % 2 == 0, "pack_heads needs an even head count"
    return x.reshape(b, h // 2, 2, s, d).swapaxes(2, 3).reshape(
        b, h // 2, s, 2 * d
    )


def unpack_heads(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_heads`: [B, H/2, S, 128] → [B, H, S, 64]."""
    b, h2, s, d2 = x.shape
    d = d2 // 2
    return x.reshape(b, h2, s, 2, d).swapaxes(2, 3).reshape(
        b, 2 * h2, s, d
    )


def quantized_flash_attention_forward_packed(
    q_packed: jnp.ndarray,
    k: QuantizedTensor,
    v: QuantizedTensor,
    *,
    mask: MaskSpec = FULL,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Head-pair-packed d=64 quantized forward over the PACKED layout.

    ``q_packed``: [B, Hq/2, Sq, 128] — head pairs lane-concatenated
    (:func:`pack_heads`).  K/V stay natural [B, Hkv, Skv, 64] quantized
    (int8, or packed int4), SYMMETRIC with TENSOR/CHANNEL scales (the
    folded pipeline's preconditions).  Mask: NONE or CAUSAL.  Returns
    (o_packed [B, Hq/2, Sq, 128] ``out_dtype``, l [B, Hq, Sq] natural-log
    lse).  Callers that keep the packed layout across layers (the
    transformer's ``packed_d64`` mode, the serving executors) pay ZERO
    pack/unpack transposes per attention call — this is how the exp35
    kernel-level rate survives production (exp37/round-5 thesis).
    """
    b, h2, sq, d2 = q_packed.shape
    d = d2 // 2
    hq = 2 * h2
    _, hkv, skv, dk_ = k.shape
    if d != 64 or dk_ != 64:
        raise ValueError("packed layout is the d=64 head-pair format")
    if mask.kind not in (MaskKind.NONE, MaskKind.CAUSAL):
        raise ValueError("packed attention supports NONE/CAUSAL masks")
    for t, name in ((k, "K"), (v, "V")):
        if t.config.strategy != QuantStrategy.SYMMETRIC or (
            t.config.granularity
            not in (QuantGranularity.TENSOR, QuantGranularity.CHANNEL)
        ):
            raise ValueError(
                f"packed attention needs SYMMETRIC TENSOR/CHANNEL {name} "
                "scales (the folded pipeline's preconditions)"
            )
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()
    q_per_kv = hq // hkv

    def kvh(h):
        return (h % hkv) if interleaved_kv else (h // q_per_kv)

    i1 = np.asarray([kvh(2 * p) for p in range(h2)])
    i2 = np.asarray([kvh(2 * p + 1) for p in range(h2)])

    # Fold softmax scale · log2e (+ K scales) into packed Q.  CHANNEL K
    # scales fold ELEMENTWISE via the pair-concatenated scale vector
    # (exact: score = Σ_d (q[d]·s_k[d])·k_int[t,d]).
    pre = scale * _LOG2E
    if k.config.granularity == QuantGranularity.CHANNEL:
        ksf = k.scale.reshape(b, hkv, d).astype(jnp.float32)
        ksc_cat = jnp.concatenate(
            [ksf[:, i1], ksf[:, i2]], axis=-1
        )[:, :, None, :]  # [B, h2, 1, 128]
        q_packed = (
            q_packed.astype(jnp.float32) * (ksc_cat * pre)
        ).astype(q_packed.dtype)
    else:
        pre = pre * k.scale.reshape(()).astype(jnp.float32)
        q_packed = (q_packed.astype(jnp.float32) * pre).astype(
            q_packed.dtype
        )

    # Folded V scales, lane-concatenated per head pair: [B, h2, 1, 128].
    if v.config.granularity == QuantGranularity.CHANNEL:
        vs_full = v.scale.reshape(b, hkv, d).astype(jnp.float32)
    else:
        vs_full = jnp.broadcast_to(
            v.scale.reshape(1, 1, 1).astype(jnp.float32), (b, hkv, d)
        )
    vsc_cat = jnp.concatenate(
        [vs_full[:, i1], vs_full[:, i2]], axis=-1
    )[:, :, None, :]  # [B, h2, 1, 128]
    return _hpack_core(
        q_packed, k, v, vsc_cat,
        mask=mask, interleaved_kv=interleaved_kv, out_dtype=out_dtype,
        interpret=interpret, block_sizes=block_sizes,
    )


def _hpack_forward(
    q, k, v, *, mask, scale, interleaved_kv, out_dtype, interpret,
    block_sizes,
):
    """Natural-layout boundary of the head-pair-packed d=64 forward.

    Caller (quantized_flash_attention_forward) has already validated the
    folded preconditions; this path additionally requires d=64, even hq,
    NONE/CAUSAL mask, no bias/padding, TENSOR/CHANNEL scales.  Packs Q
    host-side (one XLA transpose — pair-block kernel fetches measured
    ~25% slower, exp35), runs the packed core, unpacks O.  Callers that
    can keep the packed layout across calls should use
    :func:`quantized_flash_attention_forward_packed` instead and skip
    both transposes.  Returns (o [B,Hq,Sq,64] out_dtype, l [B,Hq,Sq]
    natural-log lse)."""
    o_p, l = quantized_flash_attention_forward_packed(
        pack_heads(q), k, v,
        mask=mask, scale=scale, interleaved_kv=interleaved_kv,
        out_dtype=out_dtype, interpret=interpret, block_sizes=block_sizes,
    )
    return unpack_heads(o_p), l


def _hpack_core(
    q, k, v, vsc_cat, *, mask, interleaved_kv, out_dtype, interpret,
    block_sizes,
):
    """Packed-layout kernel dispatch: q [B, h2, Sq, 128] pre-scaled and
    lane-packed; returns (o_packed, l [B, Hq, Sq])."""
    b, h2, sq, _ = q.shape
    _, hkv, skv, _ = k.shape
    d = 64
    hq = 2 * h2
    q_per_kv = hq // hkv
    causal = mask.kind == MaskKind.CAUSAL
    off = skv - sq
    bits_k, bits_v = k.config.bits, v.config.bits

    # Measured defaults (exp35/exp35b + round-5 exp40 packed-API sweep,
    # docs/perf_notes.md): (1024, 512, M1024) for BOTH masks — at FULL,
    # bq=1024 beat bq=512 70.6 vs 66.0 TF/s within-run through the packed
    # API.  Explicit block_sizes are honored but CAPPED at bq ≤ 1024,
    # bkv ≤ 512, major ≤ 1024: bq=2048 and major=2048 (4-deep unroll)
    # both crash the Mosaic compiler for this kernel's [bq, 128]-packed
    # body (exp40, HTTP 500) — the caps keep user-supplied BlockSizes out
    # of the crash geometries rather than raising (unlike the unpacked
    # kernels, NO packed configuration needs the bigger shapes).
    if block_sizes == BlockSizes():
        bq, bkv, bkvm = 1024, 512, 1024
    else:
        bq = min(block_sizes.block_q, 1024)
        bkv = min(block_sizes.block_kv, 512)
        bkvm = min(max(block_sizes.kv_major, bkv), 1024)
    while sq % bq:
        bq //= 2
    while skv % bkv:
        bkv //= 2
    bkvm = min(bkvm, skv)
    bkvm -= bkvm % bkv
    if interpret and not _interpret_two_level():
        bkvm = bkv
    n_inner = bkvm // bkv
    ni, nj = sq // bq, skv // bkvm

    def kvh(h):
        return (h % hkv) if interleaved_kv else (h // q_per_kv)

    pd = d // 2 if bits_k == 4 else d
    pdv = d // 2 if bits_v == 4 else d

    def hi_of(i):
        # Works on traced index-map args and concrete ints alike.
        return jnp.clip(-(-((i + 1) * bq + off) // bkvm), 1, nj)

    def kv_map(add):
        # Pure arithmetic kv-head resolution (index maps must lower to
        # scalar ops — no constant-array gathers).
        def f(bi, p, i, j):
            h = 2 * p + add
            g = (h % hkv) if interleaved_kv else (h // q_per_kv)
            jj = jnp.minimum(j, hi_of(i) - 1) if causal else j
            return (bi, g, jj, 0)

        return f

    q_map = lambda bi, p, i, j: (bi, p, i, 0)
    in_specs = [
        pl.BlockSpec((1, 1, bq, 2 * d), q_map),
        pl.BlockSpec((1, 1, bkvm, pd), kv_map(0)),
        pl.BlockSpec((1, 1, bkvm, pd), kv_map(1)),
        pl.BlockSpec((1, 1, bkvm, pdv), kv_map(0)),
        pl.BlockSpec((1, 1, bkvm, pdv), kv_map(1)),
        pl.BlockSpec((1, 1, 1, 2 * d), lambda bi, p, i, j: (bi, p, 0, 0)),
    ]
    inputs = [q, k.data, k.data, v.data, v.data, vsc_cat]
    out_specs = [
        pl.BlockSpec((1, 1, bq, 2 * d), q_map),
        pl.BlockSpec((1, 1, bq, LANES), q_map),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h2, sq, 2 * d), out_dtype),
        jax.ShapeDtypeStruct((b, h2, sq, LANES), jnp.float32),
    ]
    kernel = functools.partial(
        _hpack_kernel,
        block_q=bq, block_kv=bkv, n_inner=n_inner, causal=causal,
        off=off, bits_k=bits_k, bits_v=bits_v,
    )
    o, l = pl.pallas_call(
        kernel,
        grid=(b, h2, ni, nj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary"
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d // (2 if causal else 1),
            bytes_accessed=int(
                q.size * q.dtype.itemsize + k.data.size + v.data.size
            ),
            transcendentals=b * hq * sq * skv // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*inputs)
    # O stays PACKED [B, h2, Sq, 128] = [o_h1 | o_h2]; L is always
    # returned natural [B, Hq, Sq] (lanes [0, 64) hold h1's replicated
    # lse, [64, 128) h2's — cheap extraction, tiny tensor).
    l = jnp.stack([l[:, :, :, 0], l[:, :, :, d]], axis=2).reshape(
        b, hq, sq
    )
    return o, l


def _per_token_params(t: QuantizedTensor) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize scale/zp of a [B, H, S, D] quantized tensor to per-token
    [B, H, S, 1] float32 arrays (TENSOR broadcast; ROW pass-through)."""
    b, h, s, _ = t.shape
    g = t.config.granularity
    if g == QuantGranularity.ROW:
        scale = t.scale.reshape(b, h, s, 1).astype(jnp.float32)
        zp = t.zero_point.reshape(b, h, s, 1).astype(jnp.float32)
    elif g == QuantGranularity.TENSOR:
        scale = jnp.broadcast_to(
            t.scale.reshape(1, 1, 1, 1).astype(jnp.float32), (b, h, s, 1)
        )
        zp = jnp.broadcast_to(
            t.zero_point.reshape(1, 1, 1, 1).astype(jnp.float32), (b, h, s, 1)
        )
    else:
        raise NotImplementedError(
            f"quantized attention K/V granularity {g}; use ROW or TENSOR"
        )
    return scale, zp


def quantized_flash_attention_forward(
    q: jnp.ndarray,
    k: QuantizedTensor,
    v: QuantizedTensor,
    *,
    mask: MaskSpec = FULL,
    mask_ranges: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
    out_dtype: jnp.dtype = jnp.float32,
    quantize_q: bool = False,
    hadamard_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward with quantized K/V.  Same contract as
    ``flash_attention_forward`` with k, v as QuantizedTensors of logical
    shape [B, Hkv, Skv, D] (int8, or int4 with even D).

    ``quantize_q``: also quantize Q per token (int8 symmetric, activation
    quantization) so the score matmul runs int8×int8→int32 on the MXU at
    2× the bf16 rate.  Requires int8 K with a SYMMETRIC (zero-point-free)
    strategy; the softmax scale folds into the Q scales exactly.

    ``hadamard_block``: K/V were quantized in the Hadamard-rotated basis
    (``ops.hadamard.rotate_quantize`` — the reference's ConvRot outlier
    smoothing, ``HadamardRotation.swift:1-40``).  Q is rotated on the fly
    and O un-rotated after the kernel: H is orthonormal and involutive, so
    scores Q·H·(K·H)ᵀ = Q·Kᵀ and O = (P·V·H)·H are EXACT — the rotation
    only changes what the int rounding sees, spreading outliers across the
    head dim (the int4 accuracy win).  Two [S, D] elementwise passes; the
    kernel itself is unchanged.
    """
    b, hq, sq, d = q.shape
    _, hkv, skv, dk2 = k.shape
    assert d == dk2 and tuple(v.shape) == tuple(k.shape)
    assert hq % hkv == 0
    # Per-operand bit widths (facade's key_bits/value_bits split).  At a
    # mixed 4/8-bit budget prefer K int4 + V int8: V quant error passes
    # through the softmax-weighted average UNDAMPED in norm-relative terms
    # (||O|| shrinks under averaging exactly as fast as the error does),
    # while K error is softened by the softmax — measured O rel err at
    # d=256 causal gaussian: K4V8 0.087 vs K8V4 0.098, K4-only 0.086 vs
    # V4-only 0.098 (docs/perf_notes.md "int4 error anatomy").
    bits_k, bits_v = k.config.bits, v.config.bits
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()
    ks_folded = False
    int8_pv = False
    if quantize_q:
        if (
            k.config.strategy != QuantStrategy.SYMMETRIC
            or k.config.granularity
            not in (QuantGranularity.ROW, QuantGranularity.TENSOR)
        ):
            raise ValueError(
                "quantize_q needs SYMMETRIC K with ROW or TENSOR scales "
                "(the zero-point-free int8 MXU score path)"
            )
        # TENSOR K: the scalar scale folds into the Q scales on the host —
        # the in-kernel column multiply disappears entirely.
        ks_folded = k.config.granularity == QuantGranularity.TENSOR
        # Full-integer pipeline: V scales that fold OUT of the PV matmul
        # (per-channel or per-tensor, symmetric) let P×V run int8×int8 on
        # the MXU too — both dots at 2× the bf16 rate.
        int8_pv = (
            v.config.strategy == QuantStrategy.SYMMETRIC
            and v.config.granularity
            in (QuantGranularity.CHANNEL, QuantGranularity.TENSOR)
        )
    # Dequant-free fast path: with zero-point-free TENSOR/CHANNEL K and
    # TENSOR/CHANNEL V, the K scales fold into the Q pre-scale (a scalar
    # for TENSOR; an exact per-d elementwise vector for CHANNEL — score =
    # Σ_d (q[d]·s_k[d])·k_int[t,d]) and the V scales fold at store — the
    # int payloads feed the MXU directly via MIXED bf16×int8 dots
    # (measured exact on v5e), zero per-tile dequant/scale VPU work, half
    # (int8) or a quarter (int4, in-kernel nibble unpack) the KV DMA of
    # bf16.
    # Per-token (ROW) symmetric scales stay on the folded path too: K
    # costs one score column-multiply per tile, V one P column-multiply —
    # the payload itself is never touched by a dequant pass.
    _folded_grans = (
        QuantGranularity.TENSOR,
        QuantGranularity.CHANNEL,
        QuantGranularity.ROW,
    )
    kv_folded = (
        not quantize_q
        and bits_k in (4, 8)
        and bits_v in (4, 8)
        and q.dtype != jnp.float32
        and k.config.strategy == QuantStrategy.SYMMETRIC
        and k.config.granularity in _folded_grans
        and v.config.strategy == QuantStrategy.SYMMETRIC
        and v.config.granularity in _folded_grans
    )
    k_rowscale = (
        kv_folded and k.config.granularity == QuantGranularity.ROW
    )
    v_rowscale = (
        kv_folded and v.config.granularity == QuantGranularity.ROW
    )
    if (
        not quantize_q
        and not kv_folded
        and v.config.granularity == QuantGranularity.CHANNEL
    ):
        raise ValueError(
            "CHANNEL-granularity V requires the full-integer pipeline "
            "(quantize_q=True) or the folded int8 fast path (symmetric "
            "TENSOR K, non-fp32 Q)"
        )

    # Head-PAIR-packed d=64 path (round 4, exp35/exp37): one full-depth
    # MXU pass per head pair.  Production A/B (within-run): FULL +0-9%
    # over the unpacked kernel; CAUSAL measured NEUTRAL-to-NEGATIVE once
    # the control ran its proper block table (the exp35 prototype's +40%
    # was against a mis-blocked control, and the production path pays
    # pack/unpack transposes the prototype didn't) — so hpack engages
    # for UNMASKED problems only; MFA_HPACK_CAUSAL=1 re-enables the
    # causal variant for experiments, MFA_NO_HPACK=1 disables entirely.
    if (
        kv_folded
        and not (k_rowscale or v_rowscale)
        and d == 64
        and hq % 2 == 0
        and bias is None
        and mask_ranges is None
        and hadamard_block is None
        and (
            mask.kind == MaskKind.NONE
            or (
                mask.kind == MaskKind.CAUSAL
                and os.environ.get("MFA_HPACK_CAUSAL") == "1"
            )
        )
        and not (mask.kind == MaskKind.CAUSAL and skv < sq)
        and sq % 128 == 0
        and skv % 128 == 0
        and mask_value == DEFAULT_MASK_VALUE
        and not os.environ.get("MFA_NO_HPACK")
    ):
        return _hpack_forward(
            q, k, v, mask=mask, scale=scale,
            interleaved_kv=interleaved_kv, out_dtype=out_dtype,
            interpret=interpret, block_sizes=block_sizes,
        )

    if hadamard_block:
        from metal_flash_attention_plus_tpu.ops.hadamard import (
            hadamard_transform,
        )

        q = hadamard_transform(q, hadamard_block)

    in_dtype = q.dtype  # pre-quantization dtype drives compute precision
    bq = min(block_sizes.block_q, _round_up(sq, 128))
    bkv = min(block_sizes.block_kv, _round_up(skv, 128))
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
    if (
        n_inner >= 8 and not interpret
        and not kv_folded and not quantize_q
    ):
        # Known Mosaic compiler crash (HTTP 500 from tpu_compile_helper,
        # not a Python exception): the DEQUANT-ON-LOAD code unrolled 8×
        # per grid step blows up the Mosaic lowering (docs/perf_notes.md
        # round-2 "two-level"; repro: experiments/exp34_mosaic_crash_repro
        # .py).  The folded/full-integer pipelines carry no per-tile
        # dequant code and compile fine at n_inner=8 (they have shipped
        # that way since round 2) — only the legacy dequant and block2d
        # paths are guarded.  Reject with an actionable error instead of
        # a runtime RPC failure.
        raise ValueError(
            f"quantized dequant-on-load forward with block_kv_major/"
            f"block_kv = {n_inner} >= 8 crashes the Mosaic compiler on "
            "TPU (known toolchain bug); use block_kv_major <= 4*block_kv "
            f"— e.g. BlockSizes(block_kv={bkv}, block_kv_major={4 * bkv})"
        )
    sq_p = _round_up(sq, bq)
    skv_p = _round_up(skv, bkv_major)
    # ones-fused rowsum when the head dim leaves lane slack (see
    # flash_attention._fwd_kernel); the ones lanes are appended to the
    # DEQUANTIZED V tile in-kernel.  Per-token V scales fold into P, so
    # the ones lanes would carry Σp·s_v — the denominator needs the
    # unscaled Σp, so v_rowscale takes the explicit-rowsum path.
    ones = (d % 128) != 0 and not v_rowscale
    dv = _round_up(d, 128) if ones else d

    if quantize_q:
        # Per-token symmetric Q; fold the softmax scale into the scales
        # (exact — no rounding of Q by the scale).
        absmax = jnp.max(
            jnp.abs(q.astype(jnp.float32)), axis=-1, keepdims=True
        )
        q_scale = jnp.maximum(absmax, 1e-12) / 127.0
        qq = jnp.clip(
            jnp.round(q.astype(jnp.float32) / q_scale), -128, 127
        ).astype(jnp.int8)
        # softmax scale AND log2(e) fold into the Q scales (base-2
        # softmax in-kernel).
        qs_arr = (q_scale * (scale * _LOG2E)).astype(jnp.float32)
        if ks_folded:
            qs_arr = qs_arr * k.scale.reshape(()).astype(jnp.float32)
        q = qq
    else:
        pre = scale * _LOG2E
        if kv_folded and k_rowscale:
            # ROW K scales ride as a transposed in-kernel input instead.
            q = (q.astype(jnp.float32) * pre).astype(q.dtype)
        elif kv_folded and k.config.granularity == QuantGranularity.CHANNEL:
            # Per-CHANNEL K scales fold into Q ELEMENTWISE (exact):
            # score = Σ_d (q[d]·s_k[d])·k_int[t,d].  Broadcast across the
            # GQA head group sharing each KV head.
            ksc = k.scale.reshape(b, hkv, 1, 1, d).astype(jnp.float32)
            qf = q.astype(jnp.float32).reshape(b, hkv, hq // hkv, sq, d)
            q = (qf * (ksc * pre)).reshape(b, hq, sq, d).astype(q.dtype)
        else:
            if kv_folded:
                # TENSOR K scale folds into the Q pre-scale (traced scalar).
                pre = pre * k.scale.reshape(()).astype(jnp.float32)
            q = (q.astype(jnp.float32) * pre).astype(q.dtype)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
        if quantize_q:
            qs_arr = jnp.pad(
                qs_arr, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)),
                constant_values=1.0,
            )

    kq, vq = k.data, v.data  # [B,Hkv,Skv,D] int8 or [B,Hkv,Skv,D/2] uint8
    kv_gran = (
        "block2d"
        if k.config.granularity == QuantGranularity.BLOCK_2D
        else "token"
    )
    vsc = ksr_t = vsr_t = None
    if int8_pv or kv_folded:
        # K scales: ROW → transposed row-vector kernel input; TENSOR →
        # already folded into the Q scales (no input at all).
        ks = kz = None
        if int8_pv and not ks_folded:
            ks, kz = _per_token_params(k)
        if k_rowscale:
            ksr_t = jnp.swapaxes(
                k.scale.reshape(b, hkv, skv, 1).astype(jnp.float32), 2, 3
            )  # [B, Hkv, 1, Skv]
        if v_rowscale:
            vsr_t = jnp.swapaxes(
                v.scale.reshape(b, hkv, skv, 1).astype(jnp.float32), 2, 3
            )
        else:
            # V scales fold at store: one [B, Hkv, 1, dv] row vector
            # (TENSOR broadcasts; the ones lanes get a placeholder 1.0 —
            # the store only reads [:d]).
            if v.config.granularity == QuantGranularity.CHANNEL:
                vsc = v.scale.reshape(b, hkv, 1, d).astype(jnp.float32)
            else:
                vsc = jnp.broadcast_to(
                    v.scale.reshape(1, 1, 1, 1).astype(jnp.float32),
                    (b, hkv, 1, d),
                )
            if dv != d:
                vsc = jnp.concatenate(
                    [vsc, jnp.ones((b, hkv, 1, dv - d), jnp.float32)],
                    axis=-1,
                )
        vs = vz = None
    elif kv_gran == "block2d":
        # In-kernel 2D blockwise scales (reference BLOCK_2D parity,
        # ``AttentionKernel+Accumulate.swift:451-511``): scale/zp arrive as
        # [B, Hkv, Skv/br, D/bs] tiles and are expanded on the MXU inside
        # the kernel (ops.quantized_gemm.dequant_kv_tile_block2d).
        if quantize_q:
            raise ValueError("quantize_q requires per-token (ROW) K scales")
        if v.config.granularity != QuantGranularity.BLOCK_2D or (
            (k.config.block_rows, k.config.block_size)
            != (v.config.block_rows, v.config.block_size)
        ):
            raise ValueError("K/V must share BLOCK_2D block geometry")
        br, bs2 = k.config.block_rows, k.config.block_size
        if 128 % br != 0:
            raise ValueError(f"block_rows {br} must divide 128")
        ks = k.scale.astype(jnp.float32)
        kz = k.zero_point.astype(jnp.float32)
        vs = v.scale.astype(jnp.float32)
        vz = v.zero_point.astype(jnp.float32)
    else:
        ks, kz = _per_token_params(k)
        vs, vz = _per_token_params(v)
    if skv_p != skv:
        pad4 = ((0, 0), (0, 0), (0, skv_p - skv), (0, 0))
        kq = jnp.pad(kq, pad4)
        vq = jnp.pad(vq, pad4)
        if int8_pv or kv_folded:
            if ks is not None:
                ks = jnp.pad(ks, pad4, constant_values=1.0)
            padt = ((0, 0), (0, 0), (0, 0), (0, skv_p - skv))
            if ksr_t is not None:
                ksr_t = jnp.pad(ksr_t, padt, constant_values=1.0)
            if vsr_t is not None:
                vsr_t = jnp.pad(vsr_t, padt, constant_values=1.0)
        else:
            pad_s = (
                ((0, 0), (0, 0), (0, (skv_p - skv) // br), (0, 0))
                if kv_gran == "block2d"
                else pad4
            )
            ks = jnp.pad(ks, pad_s, constant_values=1.0)
            kz = jnp.pad(kz, pad_s)
            vs = jnp.pad(vs, pad_s, constant_values=1.0)
            vz = jnp.pad(vz, pad_s)
    if (int8_pv or kv_folded) and ones and bits_v == 8:
        # Host-pad the int8 V payload with integer ONES lanes — the PV dot
        # then emits the P-unit rowsum in the spare MXU lanes (ones-fused
        # rowsum; packed-int4 payloads concat their ones in-kernel after
        # the unpack instead).
        vq = jnp.concatenate(
            [vq, jnp.ones((b, hkv, skv_p, dv - d), jnp.int8)], axis=-1
        )
    if quantize_q and not ks_folded:
        ks_t = jnp.swapaxes(ks, 2, 3)  # [B,Hkv,1,Skv_p] row-vector scales
    if bias is not None:
        bias = jnp.pad(
            bias,
            [(0, 0), (0, 0), (0, sq_p - bias.shape[2]),
             (0, skv_p - bias.shape[3])],
        )

    has_mask = mask.kind != MaskKind.NONE or skv_p != skv or sq_p != sq
    # Traced (dynamic) ranges — same policy as flash_attention_forward:
    # bounds become scalar-prefetch data over a full-width grid.
    dynamic = isinstance(mask_ranges, jnp.ndarray) and not isinstance(
        mask_ranges, np.ndarray
    )
    if dynamic:
        if mask.kind != MaskKind.SPARSE_RANGES:
            raise ValueError(
                "traced mask_ranges require MaskKind.SPARSE_RANGES"
            )
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            build_block_bounds_dynamic,
            compute_row_ranges_dynamic,
        )

        row_ranges = compute_row_ranges_dynamic(
            mask_ranges, sq, skv, sq_p, skv
        )
        lo_arr, hi_arr = build_block_bounds_dynamic(
            row_ranges, bq, bkv_major
        )
        loi_arr, hii_arr = build_block_bounds_dynamic(row_ranges, bq, bkv)
        mask_mode, affine = "ranges", (0, 0, 0, 0)
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            build_rowstat_bounds_dynamic,
        )

        ms_arr, me_arr = build_rowstat_bounds_dynamic(row_ranges, bq)
    else:
        row_ranges = compute_row_ranges(
            mask, sq, skv, mask_ranges=mask_ranges,
            seq_q_padded=sq_p, seq_kv_cap=skv,
        )
        lo_arr, hi_arr, ms_arr, me_arr = build_block_bounds(
            row_ranges, bq, bkv_major
        )
        loi_arr, hii_arr, _, _ = build_block_bounds(row_ranges, bq, bkv)
        mask_mode, affine = resolve_mask_mode(mask, has_mask, sq, skv)
    # Every row statically live (causal, full, most windows) → the store's
    # empty-row where-guards are dead code; skip them (saves 2-3 VPU passes
    # per q-row store).
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
    nj_all = skv_p // bkv_major
    nj_max = nj_all if dynamic else max(1, int((hi_arr - lo_arr).max()))
    q_per_kv = hq // hkv

    # Schedule: LEAN dense grid for UNMASKED static problems (no scalar
    # prefetch, reciprocal epilogue — measured +7% over flat at FULL
    # d=256, exp33/docs/perf_notes.md round 4); else packed-pair when it
    # removes ≥10% of grid steps; else the dense (i, j) grid.  Same
    # policy and machinery as flash_attention_forward.
    lean = (
        not dynamic and not has_mask
        and not os.environ.get("MFA_NO_LEAN")
    )
    if dynamic or lean:
        packed = False  # traced bounds / lean: no host packing
    else:
        q0a, q1a, n0a, ta, nrows, width = build_packed_schedule(
            lo_arr, hi_arr
        )
        packed = ni > 1 and nrows * width < 0.9 * ni * nj_max

    def kv_head(h):
        return (h % hkv) if interleaved_kv else (h // q_per_kv)

    if lean:
        grid = (b, hq, ni, nj_all)
        scalars = ()

        def q_block(args):
            return args[2]

        def kv_block(args):
            return args[3]
    elif packed:
        grid = (b, hq, nrows, width)
        scalars = (
            jnp.asarray(q0a), jnp.asarray(q1a), jnp.asarray(n0a),
            jnp.asarray(ta), jnp.asarray(lo_arr), jnp.asarray(hi_arr),
            jnp.asarray(loi_arr), jnp.asarray(hii_arr),
        )
        if mask_mode == "ranges":
            scalars += (jnp.asarray(ms_arr), jnp.asarray(me_arr))

        def q_block(args):
            _, _, r, j, q0, q1, n0, t = args[:8]
            seg1 = jnp.logical_and(j >= n0[r], t[r] > n0[r])
            return jnp.where(seg1, q1[r], q0[r])

        def kv_block(args):
            _, _, r, j, q0, q1, n0, t, lo, hi = args[:10]
            seg1 = jnp.logical_and(j >= n0[r], t[r] > n0[r])
            qi = jnp.where(seg1, q1[r], q0[r])
            jj = j - jnp.where(seg1, n0[r], 0)
            run = hi[qi] - lo[qi]
            return jnp.clip(lo[qi] + jnp.minimum(jj, run - 1), 0, nj_all - 1)
    else:
        grid = (b, hq, ni, nj_max)
        scalars = (
            jnp.asarray(lo_arr), jnp.asarray(hi_arr),
            jnp.asarray(loi_arr), jnp.asarray(hii_arr),
        )
        if mask_mode == "ranges":
            scalars += (jnp.asarray(ms_arr), jnp.asarray(me_arr))

        def q_block(args):
            return args[2]

        def kv_block(args):
            _, _, i, j, lo, hi = args[:6]
            run = hi[i] - lo[i]
            return jnp.clip(lo[i] + jnp.minimum(j, run - 1), 0, nj_all - 1)

    pd_k = d // 2 if bits_k == 4 else d
    pd_v = d // 2 if bits_v == 4 else d

    in_specs = []
    inputs = []
    if mask_mode == "ranges":
        rspec = pl.BlockSpec((bq, 1), lambda *a: (q_block(a), 0))
        in_specs += [rspec, rspec]
        inputs += [
            jnp.asarray(row_ranges[:, 0:1]),
            jnp.asarray(row_ranges[:, 1:2]),
        ]

    def kv_spec(width_):
        return pl.BlockSpec(
            (1, 1, bkv_major, width_),
            lambda *a: (a[0], kv_head(a[1]), kv_block(a), 0),
        )

    q_spec = pl.BlockSpec(
        (1, 1, bq, d), lambda *a: (a[0], a[1], q_block(a), 0)
    )
    if quantize_q:
        in_specs += [
            q_spec,
            pl.BlockSpec(
                (1, 1, bq, 1), lambda *a: (a[0], a[1], q_block(a), 0)
            ),
            kv_spec(pd_k),
        ]
        inputs += [q, qs_arr, kq]
        if not ks_folded:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, bkv_major),
                    lambda *a: (a[0], kv_head(a[1]), 0, kv_block(a)),
                )
            )
            inputs.append(ks_t)
        if int8_pv:
            pv_width = dv if bits_v == 8 else pd_v
            in_specs += [
                kv_spec(pv_width),
                pl.BlockSpec(
                    (1, 1, 1, dv),
                    lambda *a: (a[0], kv_head(a[1]), 0, 0),
                ),
            ]
            inputs += [vq, vsc]
        else:
            in_specs += [kv_spec(pd_v), kv_spec(1), kv_spec(1)]
            inputs += [vq, vs, vz]
    elif kv_folded:
        tok_spec = pl.BlockSpec(
            (1, 1, 1, bkv_major),
            lambda *a: (a[0], kv_head(a[1]), 0, kv_block(a)),
        )
        in_specs += [q_spec, kv_spec(pd_k)]
        inputs += [q, kq]
        if k_rowscale:
            in_specs.append(tok_spec)
            inputs.append(ksr_t)
        # int8 V payload (ones lanes host-padded); int4 stays packed
        # and unpacks + concats its ones in-kernel.
        in_specs.append(kv_spec(dv if bits_v == 8 and ones else pd_v))
        inputs.append(vq)
        if v_rowscale:
            in_specs.append(tok_spec)
            inputs.append(vsr_t)
        else:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, dv),
                    lambda *a: (a[0], kv_head(a[1]), 0, 0),
                )
            )
            inputs.append(vsc)
    elif kv_gran == "block2d":
        def sc_spec():
            return pl.BlockSpec(
                (1, 1, bkv_major // br, d // bs2),
                lambda *a: (a[0], kv_head(a[1]), kv_block(a), 0),
            )

        in_specs += [
            q_spec,
            kv_spec(pd_k), sc_spec(), sc_spec(),
            kv_spec(pd_v), sc_spec(), sc_spec(),
        ]
        inputs += [q, kq, ks, kz, vq, vs, vz]
        er, ec = block2d_expanders(br, bs2, bkv, d)  # inner-tile sized
        if er is not None:
            in_specs.append(
                pl.BlockSpec((bkv, bkv // br), lambda *a: (0, 0))
            )
            inputs.append(er)
        in_specs.append(pl.BlockSpec((d // bs2, d), lambda *a: (0, 0)))
        inputs.append(ec)
    else:
        in_specs += [
            q_spec,
            kv_spec(pd_k), kv_spec(1), kv_spec(1),  # K payload, scale, zp
            kv_spec(pd_v), kv_spec(1), kv_spec(1),  # V payload, scale, zp
        ]
        inputs += [q, kq, ks, kz, vq, vs, vz]
    if bias is not None:
        bb = bias.shape[0] == 1
        bh = bias.shape[1] == 1
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bq, bkv_major),
                lambda *a: (
                    0 if bb else a[0], 0 if bh else a[1], q_block(a),
                    kv_block(a),
                ),
            )
        )
        inputs.append(bias)

    compute_dtype = jnp.float32 if in_dtype == jnp.float32 else jnp.bfloat16
    kernel = functools.partial(
        _qfwd_kernel,
        block_q=bq,
        block_kv=bkv,
        n_inner=n_inner,
        head_dim=d,
        dv=dv,
        mask_mode=mask_mode,
        affine=affine,
        has_bias=bias is not None,
        mask_value=mask_value,
        bits_k=bits_k,
        bits_v=bits_v,
        quantize_q=quantize_q,
        precision=(
            jax.lax.Precision.HIGHEST
            if in_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
        compute_dtype=compute_dtype,
        kv_gran=kv_gran,
        has_er=(kv_gran == "block2d" and br > 1),
        has_rowstats=mask_mode == "ranges",
        inner_skip=inner_skip,
        ones=ones,
        packed=packed,
        int8_pv=int8_pv,
        ks_folded=ks_folded,
        kv_folded=kv_folded,
        k_rowscale=k_rowscale,
        v_rowscale=v_rowscale,
        skip_row_guard=all_live,
        lean=lean,
    )

    out_shape = [
        jax.ShapeDtypeStruct((b, hq, sq_p, d), out_dtype),
        jax.ShapeDtypeStruct((b, hq, sq_p, LANES), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda *a: (a[0], a[1], q_block(a), 0)),
        pl.BlockSpec(
            (1, 1, bq, LANES), lambda *a: (a[0], a[1], q_block(a), 0)
        ),
    ]

    scratch = [pltpu.VMEM((bq, LANES), jnp.float32)]  # m
    if not ones:
        scratch.append(pltpu.VMEM((bq, LANES), jnp.float32))  # l
    scratch.append(pltpu.VMEM((bq, dv if ones else d), jnp.float32))  # acc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    live_tiles = ni * nj_all if dynamic else int((hi_arr - lo_arr).sum())
    o, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary"
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * live_tiles * bq * bkv * d,
            bytes_accessed=int(
                q.size * q.dtype.itemsize + kq.size + vq.size
            ),
            transcendentals=b * hq * live_tiles * bq * bkv,
        ),
        interpret=interpret,
    )(
        *scalars,
        *inputs,
    )
    if hadamard_block:
        # V was stored rotated → O came out rotated; apply H once more
        # (involution) to return to the original basis.
        o = hadamard_transform(
            o.astype(jnp.float32), hadamard_block
        ).astype(out_dtype)
    return o[:, :, :sq, :], l[:, :, :sq, 0]


# ---------------------------------------------------------------------------
# Differentiable wrapper: grads flow to q (and bias); K/V payloads are data.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
)
def _qattn(q, kv_flat, bias,
           kv_meta, mask, scale, block_sizes, interleaved_kv, mask_value,
           interpret, hadamard_block, quantize_q, bwd_fullint):
    k, v = _rebuild_kv(kv_flat, kv_meta)
    o, _ = quantized_flash_attention_forward(
        q, k, v, bias=bias, mask=mask, scale=scale, block_sizes=block_sizes,
        interleaved_kv=interleaved_kv, mask_value=mask_value,
        interpret=interpret, hadamard_block=hadamard_block,
        quantize_q=quantize_q,
    )
    return o.astype(q.dtype)


@dataclasses.dataclass(frozen=True)
class _KVMeta:
    config_k: QuantConfig
    config_v: QuantConfig
    shape: Tuple[int, ...]
    has_sums_k: bool
    has_sums_v: bool


def _flatten_kv(k: QuantizedTensor, v: QuantizedTensor):
    flat = (k.data, k.scale, k.zero_point, v.data, v.scale, v.zero_point)
    meta = _KVMeta(
        k.config, v.config, tuple(k.shape),
        k.sums is not None, v.sums is not None,
    )
    return flat, meta


def _rebuild_kv(flat, meta: _KVMeta):
    kd, ks, kz, vd, vs, vz = flat
    k = QuantizedTensor(
        data=kd, scale=ks, zero_point=kz, sums=None,
        config=meta.config_k, shape=meta.shape,
    )
    v = QuantizedTensor(
        data=vd, scale=vs, zero_point=vz, sums=None,
        config=meta.config_v, shape=meta.shape,
    )
    return k, v


def _qattn_fwd(q, kv_flat, bias,
               kv_meta, mask, scale, block_sizes, interleaved_kv, mask_value,
               interpret, hadamard_block, quantize_q, bwd_fullint):
    k, v = _rebuild_kv(kv_flat, kv_meta)
    o, l = quantized_flash_attention_forward(
        q, k, v, bias=bias, mask=mask, scale=scale, block_sizes=block_sizes,
        interleaved_kv=interleaved_kv, mask_value=mask_value,
        interpret=interpret, hadamard_block=hadamard_block,
        quantize_q=quantize_q,
    )
    return o.astype(q.dtype), (q, kv_flat, bias, o, l)


def _scale_zp_cotangents(dxdeq, qt: QuantizedTensor):
    """Exact cotangents of X_deq = (w − zp)·scale w.r.t. (scale, zp).

    ``dxdeq`` is the gradient w.r.t. the dequantized operand (from the
    dequantizing dKV kernel); the payload w is integer data (cotangent
    float0).  dscale = Σ_cell dX ⊙ (w − zp); dzp = −Σ_cell dX ⊙ scale.
    ``(w − zp)`` is recovered as deq/scale so the packed-int4 layout never
    needs host-side unpacking here.
    """
    from metal_flash_attention_plus_tpu.quant.tensor import dequantize

    dxdeq = dxdeq.astype(jnp.float32)
    deq = dequantize(qt).astype(jnp.float32)
    g = qt.config.granularity
    if g == QuantGranularity.BLOCK_2D:
        br, bs2 = qt.config.block_rows, qt.config.block_size
        b_, h_, s_, d_ = qt.shape
        scale_el = jnp.repeat(
            jnp.repeat(qt.scale.astype(jnp.float32), br, axis=2),
            bs2, axis=3,
        )
    elif g == QuantGranularity.CHANNEL:
        scale_el = qt.scale.astype(jnp.float32)  # [B,H,1,D] broadcasts
    else:
        scale_el, _zp_b = _per_token_params(qt)  # [B,H,S,1] fp32
    w_minus_z = deq / scale_el
    ds_cells = dxdeq * w_minus_z
    dz_cells = -dxdeq * scale_el
    if g == QuantGranularity.ROW:
        ds = jnp.sum(ds_cells, axis=-1).reshape(qt.scale.shape)
        dz = jnp.sum(dz_cells, axis=-1).reshape(qt.zero_point.shape)
    elif g == QuantGranularity.CHANNEL:
        ds = jnp.sum(ds_cells, axis=-2, keepdims=True).reshape(
            qt.scale.shape
        )
        dz = jnp.sum(dz_cells, axis=-2, keepdims=True).reshape(
            qt.zero_point.shape
        )
    elif g == QuantGranularity.BLOCK_2D:
        # Reduce cells per (block_rows × block_size) 2D block.
        def per_block(cells):
            return jnp.sum(
                cells.reshape(b_, h_, s_ // br, br, d_ // bs2, bs2),
                axis=(3, 5),
            )

        ds = per_block(ds_cells).reshape(qt.scale.shape)
        dz = per_block(dz_cells).reshape(qt.zero_point.shape)
    else:  # TENSOR
        ds = jnp.sum(ds_cells).reshape(qt.scale.shape)
        dz = jnp.sum(dz_cells).reshape(qt.zero_point.shape)

    def cast_or_zero(g_, ref):
        if jnp.issubdtype(ref.dtype, jnp.integer):
            return np.zeros(ref.shape, jax.dtypes.float0)
        return g_.astype(ref.dtype)

    return cast_or_zero(ds, qt.scale), cast_or_zero(dz, qt.zero_point)


def _qattn_bwd(kv_meta, mask, scale, block_sizes, interleaved_kv, mask_value,
               interpret, hadamard_block, quantize_q, bwd_fullint, res, do):
    from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
        flash_attention_backward,
    )

    q, kv_flat, bias, o, l = res
    k_qt, v_qt = _rebuild_kv(kv_flat, kv_meta)
    if hadamard_block:
        # Backward runs in the rotated basis (K/V payloads are rotated):
        # rotate q/o/do in, un-rotate dq out.  dk/dv and the scale/zp
        # cotangents live in the rotated basis by construction.
        from metal_flash_attention_plus_tpu.ops.hadamard import (
            hadamard_transform,
        )

        q = hadamard_transform(q, hadamard_block)
        o = hadamard_transform(o, hadamard_block)
        do = hadamard_transform(do, hadamard_block)
    # Both kernels run with in-kernel dequant-on-load; dk/dv come back as
    # gradients w.r.t. the dequantized K/V (reference ``backwardKeyValue``
    # parity) and are chained into exact scale/zero-point cotangents — the
    # integer payloads stay float0.
    dq, dk_deq, dv_deq, dbias = flash_attention_backward(
        q, k_qt, v_qt, o, l, do,
        mask=mask, bias=bias, scale=scale, block_sizes=block_sizes,
        interleaved_kv=interleaved_kv, interpret=interpret,
        compute_dbias=bias is not None,
        fullint=bwd_fullint,
    )
    dks, dkz = _scale_zp_cotangents(dk_deq, k_qt)
    dvs, dvz = _scale_zp_cotangents(dv_deq, v_qt)

    def zero_like(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    if hadamard_block:
        from metal_flash_attention_plus_tpu.ops.hadamard import (
            hadamard_transform,
        )

        dq = hadamard_transform(dq, hadamard_block)
    kd, _, _, vd, _, _ = kv_flat
    kv_cot = (zero_like(kd), dks, dkz, zero_like(vd), dvs, dvz)
    return (
        dq.astype(q.dtype),
        kv_cot,
        None if bias is None else dbias.astype(bias.dtype),
    )


_qattn.defvjp(_qattn_fwd, _qattn_bwd)


def quantized_flash_attention(
    q: jnp.ndarray,
    k: QuantizedTensor,
    v: QuantizedTensor,
    bias: Optional[jnp.ndarray] = None,
    *,
    mask: MaskSpec = FULL,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
    hadamard_block: Optional[int] = None,
    interpret: Optional[bool] = None,
    quantize_q: bool = False,
    bwd_fullint: bool = False,
) -> jnp.ndarray:
    """Differentiable quantized-KV flash attention.

    Gradients: dq, dbias, plus exact cotangents for the K/V scale and
    zero-point arrays (via the dequantizing dKV kernel); integer payloads
    are non-differentiable (float0).  ``hadamard_block``: K/V were
    quantized in the rotated basis (see
    ``quantized_flash_attention_forward``).

    ``quantize_q``: forward runs the full-integer pipeline (per-token int8
    Q; both MXU dots int8×int8).  ``bwd_fullint``: backward runs the
    full-integer kernels too (all five backward GEMMs on the int8 MXU path
    — see ``flash_attention_bwd._fullint_backward``); gradients become
    approximate within the reference's INT8 < 0.25 backward gate, falling
    back to the exact kernels for unsupported configs (masked problems,
    non-foldable scales)."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    kv_flat, kv_meta = _flatten_kv(k, v)
    return _qattn(
        q, kv_flat, bias,
        kv_meta, mask, float(scale), block_sizes, interleaved_kv, mask_value,
        interpret, hadamard_block, quantize_q, bwd_fullint,
    )


# ---------------------------------------------------------------------------
# QAT wrapper: float K/V masters, quantized compute, STE dK/dV.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def quantized_flash_attention_qat(
    q, k, v,
    config: QuantConfig = QuantConfig(),
    mask: MaskSpec = FULL,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
    interpret: Optional[bool] = None,
):
    """Train-time quantized attention over FLOAT K/V masters.

    Forward quantizes K/V with ``config`` and runs the quantized kernel
    (exactly the serving numerics); backward runs the dequantizing dQ and
    dK/dV kernels and passes dK/dV STRAIGHT THROUGH to the float masters
    (the reference's STE contract, delegated there to an external autograd
    bridge — ``QuantizedAttention.swift:1542-1556`` — and kept in-repo
    here per SURVEY.md §7 step 5).
    """
    o, _ = _qat_fwd_impl(
        q, k, v, config, mask, scale, block_sizes, interleaved_kv,
        mask_value, interpret,
    )
    return o


def _qat_fwd_impl(q, k, v, config, mask, scale, block_sizes, interleaved_kv,
                  mask_value, interpret):
    from metal_flash_attention_plus_tpu.quant.tensor import quantize

    k_qt = quantize(k, config)
    v_qt = quantize(v, config)
    o, l = quantized_flash_attention_forward(
        q, k_qt, v_qt, mask=mask, scale=scale, block_sizes=block_sizes,
        interleaved_kv=interleaved_kv, mask_value=mask_value,
        interpret=interpret,
    )
    return o.astype(q.dtype), (q, k_qt, v_qt, o, l)


def _qat_fwd(q, k, v, config, mask, scale, block_sizes, interleaved_kv,
             mask_value, interpret):
    o, res = _qat_fwd_impl(
        q, k, v, config, mask, scale, block_sizes, interleaved_kv,
        mask_value, interpret,
    )
    return o, res


def _qat_bwd(config, mask, scale, block_sizes, interleaved_kv, mask_value,
             interpret, res, do):
    from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
        flash_attention_backward,
    )

    q, k_qt, v_qt, o, l = res
    dq, dk_deq, dv_deq, _ = flash_attention_backward(
        q, k_qt, v_qt, o, l, do,
        mask=mask, scale=scale, block_sizes=block_sizes,
        interleaved_kv=interleaved_kv, interpret=interpret,
    )
    # STE: gradients w.r.t. the dequantized K/V pass through quantization
    # to the float masters unchanged.
    return dq.astype(q.dtype), dk_deq, dv_deq


quantized_flash_attention_qat.defvjp(_qat_fwd, _qat_bwd)
