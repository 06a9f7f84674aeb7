"""Fused runtime quantization Pallas kernels.

TPU-native redesign of the reference's GPU-fused quantizers
(``GEMMBlockwiseQuantization.metal:102-413`` — the blockwise-centered path
``QuantizedAttention`` actually dispatches, and
``GEMMRuntimeQuantization.metal:137-568`` tensor/row-wise variants): one
kernel pass computes the statistics (mean / absmax / min-max), derives
scale + zero-point, quantizes, and emits optional per-block Σq compensation
sums — no second pass over the data, which is the whole point (the op is
HBM-bound; reading x twice halves throughput).

Bit-for-bit contract: these kernels must produce EXACTLY the scale /
zero-point / payload of the jnp golden ``quant.tensor.quantize``
(tests/test_runtime_quantization.py) so quantized tensors are
interchangeable between the fused and fallback paths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import (
    QuantizedTensor,
    pack_int4,
    quantize as golden_quantize,
)

_EPS = 1e-12


def _stats(slab, strategy, qmax, qmin):
    """Scale (f32 scalar) + zero point (f32 scalar) for one stats group."""
    if strategy == QuantStrategy.SYMMETRIC:
        absmax = jnp.max(jnp.abs(slab))
        scale = jnp.maximum(absmax, _EPS) / qmax
        zp = jnp.float32(0.0)
    elif strategy == QuantStrategy.CENTERED:
        mean = jnp.mean(slab)
        absmax = jnp.max(jnp.abs(slab - mean))
        scale = jnp.maximum(absmax, _EPS) / qmax
        zp = jnp.round(-mean / scale)
    elif strategy == QuantStrategy.ASYMMETRIC:
        hi = jnp.max(slab)
        lo = jnp.min(slab)
        scale = jnp.maximum(hi - lo, _EPS) / (qmax - qmin)
        zp = qmin - jnp.round(lo / scale)
    else:
        raise NotImplementedError(strategy)
    return scale, zp


def _block_kernel(
    x_ref, q_ref, scale_ref, zp_ref, sums_ref, *, strategy, qmax, qmin, want_sums
):
    b = pl.program_id(0)
    slab = x_ref[...].astype(jnp.float32)  # [R, bs] — one K-block slab
    scale, zp = _stats(slab, strategy, qmax, qmin)
    q = jnp.clip(jnp.round(slab / scale + zp), qmin, qmax)
    q_ref[...] = q.astype(jnp.int32)
    # Per-block stats are scalars → SMEM outputs, written at this block's
    # index (Mosaic cannot tile (1,1) VMEM output blocks).
    scale_ref[0, b] = scale
    zp_ref[0, b] = zp.astype(jnp.int32)
    if want_sums:
        sums_ref[0, b] = jnp.sum(q.astype(jnp.int32))


def _row_kernel(
    x_ref, q_ref, scale_ref, zp_ref, sums_ref, *, strategy, qmax, qmin, want_sums
):
    slab = x_ref[...].astype(jnp.float32)  # [br, K]
    if strategy == QuantStrategy.SYMMETRIC:
        absmax = jnp.max(jnp.abs(slab), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, _EPS) / qmax
        zp = jnp.zeros_like(scale)
    elif strategy == QuantStrategy.CENTERED:
        mean = jnp.mean(slab, axis=1, keepdims=True)
        absmax = jnp.max(jnp.abs(slab - mean), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, _EPS) / qmax
        zp = jnp.round(-mean / scale)
    elif strategy == QuantStrategy.ASYMMETRIC:
        hi = jnp.max(slab, axis=1, keepdims=True)
        lo = jnp.min(slab, axis=1, keepdims=True)
        scale = jnp.maximum(hi - lo, _EPS) / (qmax - qmin)
        zp = qmin - jnp.round(lo / scale)
    else:
        raise NotImplementedError(strategy)
    q = jnp.clip(jnp.round(slab / scale + zp), qmin, qmax)
    q_ref[...] = q.astype(jnp.int32)
    scale_ref[...] = scale
    zp_ref[...] = zp.astype(jnp.int32)
    if want_sums:
        sums_ref[...] = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)


def runtime_quantize(
    x: jnp.ndarray,
    config: QuantConfig,
    *,
    interpret: Optional[bool] = None,
) -> QuantizedTensor:
    """Fused one-pass quantization of a 2D array.

    Dispatches to a Pallas kernel for BLOCK (per-K-block, stats shared
    across rows — the blockwise-centered production path) and ROW
    granularities; TENSOR and >2D inputs fall back to the jnp golden (their
    stats are global reductions XLA already fuses well).
    """
    if interpret is None:
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            default_interpret,
        )

        interpret = default_interpret()
    if x.ndim != 2 or config.granularity not in (
        QuantGranularity.BLOCK,
        QuantGranularity.ROW,
    ):
        return golden_quantize(x, config)

    r, k = x.shape
    qmax, qmin = float(config.qmax), float(config.qmin)
    want_sums = config.compute_sums

    if config.granularity == QuantGranularity.BLOCK:
        bs = config.block_size
        if k % bs != 0:
            raise ValueError(f"K={k} not divisible by block_size={bs}")
        nb = k // bs
        kernel = functools.partial(
            _block_kernel,
            strategy=config.strategy, qmax=qmax, qmin=qmin,
            want_sums=want_sums,
        )
        grid = (nb,)
        in_specs = [pl.BlockSpec((r, bs), lambda b: (0, b))]
        out_shape = [
            jax.ShapeDtypeStruct((r, k), jnp.int32),
            jax.ShapeDtypeStruct((1, nb), jnp.float32),
            jax.ShapeDtypeStruct((1, nb), jnp.int32),
            jax.ShapeDtypeStruct((1, nb), jnp.int32),
        ]
        out_specs = [
            pl.BlockSpec((r, bs), lambda b: (0, b)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        cell_shape = (1, nb)
    else:  # ROW
        br = min(512, r) if r % 128 == 0 or r < 128 else 128
        while r % br != 0:
            br //= 2
            if br == 0:
                return golden_quantize(x, config)
        kernel = functools.partial(
            _row_kernel,
            strategy=config.strategy, qmax=qmax, qmin=qmin,
            want_sums=want_sums,
        )
        grid = (r // br,)
        in_specs = [pl.BlockSpec((br, k), lambda b: (b, 0))]
        out_shape = [
            jax.ShapeDtypeStruct((r, k), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ]
        out_specs = [
            pl.BlockSpec((br, k), lambda b: (b, 0)),
            pl.BlockSpec((br, 1), lambda b: (b, 0)),
            pl.BlockSpec((br, 1), lambda b: (b, 0)),
            pl.BlockSpec((br, 1), lambda b: (b, 0)),
        ]
        cell_shape = (r, 1)

    q, scale, zp, sums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x)

    if config.bits == 4:
        data = pack_int4(q)
    else:
        data = q.astype(jnp.int8)
    return QuantizedTensor(
        data=data,
        scale=scale.reshape(cell_shape),
        zero_point=zp.reshape(cell_shape),
        sums=sums.reshape(cell_shape) if want_sums else None,
        config=config,
        shape=(r, k),
        orig_dtype=x.dtype,
    )
