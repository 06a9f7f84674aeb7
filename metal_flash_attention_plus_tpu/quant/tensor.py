"""QuantizedTensor pytree + golden quantize/dequantize.

TPU-native analog of the reference's ``QuantizedTensor``
(``GEMMQuantization.swift:680-1078``): instead of Metal buffers + Codable
serialization, a JAX pytree (jit/pjit/shard_map-transparent) holding the
integer payload, scales, zero points, and optional precomputed per-block sums
(the ``precomputedSums`` compensation input, ``GEMMQuantization.swift:690``).

Quantization math parity (``GEMMQuantization.swift:277-677``):
- INT8 symmetric: scale = absmax/127, q = clip(round(x/scale), -128, 127).
- INT4 symmetric: scale = absmax/7, q ∈ [-8, 7] stored as nibbles q+8 ∈
  [0,15], packed two per byte along the last dim (element 2i → low nibble).
- Centered (the fused GPU path, ``GEMMBlockwiseQuantization.metal:102-193``):
  per-block mean; scale = max|x − mean|/qmax; zp = round(−mean/scale);
  q = clip(round(x/scale + zp)); dequant x ≈ (q − zp)·scale.
- Asymmetric: scale = (max−min)/(qmax−qmin); zp = qmin − round(min/scale).

These jnp implementations are the golden model AND the fallback path; the
fused Pallas runtime-quantization kernels (``ops/runtime_quantization.py``)
must match them bit-for-bit on the scale/zp computation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)


INT4_GROUP = 256  # element columns per planar packing group (= 2 × 128 lanes)


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int values in [-8, 7] into uint8 nibbles along the last dim,
    GROUP-PLANAR: within each 256-element column group, the low nibbles of
    the 128 packed bytes hold elements [0, 128) of the group and the high
    nibbles hold elements [128, 256) (a short tail group splits at its
    midpoint).  Values are stored offset by +8, 2 elements/byte — the same
    density as the reference's packing (``GEMMQuantization.swift:277-558``),
    but ordered so a TPU kernel can unpack a tile with static 128-lane
    slices + lane concatenation only (Mosaic supports neither strided lane
    access nor sub-byte interleaves; see ops/quantized_gemm.py).
    """
    k = q.shape[-1]
    if k % 2 != 0:
        raise ValueError("int4 packing requires an even last dimension")
    u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
    out = []
    for base in range(0, k, INT4_GROUP):
        g = min(INT4_GROUP, k - base)
        lo = u[..., base : base + g // 2]
        hi = u[..., base + g // 2 : base + g]
        out.append(lo | (hi << 4))
    return jnp.concatenate(out, axis=-1).astype(jnp.uint8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`; returns int8 values in [-8, 7]."""
    kp = packed.shape[-1]
    out = []
    for base in range(0, kp, INT4_GROUP // 2):
        g = min(INT4_GROUP // 2, kp - base)
        byte = packed[..., base : base + g]
        out.append((byte & 0xF).astype(jnp.int8) - 8)
        out.append((byte >> 4).astype(jnp.int8) - 8)
    return jnp.concatenate(out, axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """Integer payload + quantization parameters as one pytree.

    ``data``: int8 ``[..., K]`` (bits=8) or packed uint8 ``[..., K//2]``
    (bits=4).  ``scale``/``zero_point`` shapes by granularity over a
    ``[..., R, K]`` logical view:

      TENSOR   → [1, 1] (2D so it shards/SMEMs cleanly)
      ROW      → [..., R, 1]
      BLOCK    → [..., 1, K/bs]   (K-blocks shared across rows — GEMM mode)
      BLOCK_2D → [..., R/br, K/bs]

    ``sums``: optional int32 Σq per scale cell (compensation input).
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    zero_point: jnp.ndarray
    sums: Optional[jnp.ndarray]
    config: QuantConfig = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    orig_dtype: jnp.dtype = dataclasses.field(
        default=jnp.float32, metadata=dict(static=True)
    )

    @property
    def bits(self) -> int:
        return self.config.bits

    def dequantize(self) -> jnp.ndarray:
        return dequantize(self)

    @property
    def nbytes_payload(self) -> int:
        import numpy as np

        return int(np.prod(self.data.shape)) * self.data.dtype.itemsize


def _scale_reduce(x: jnp.ndarray, config: QuantConfig):
    """Compute (scale, zero_point, grouped view info) for x of shape [..., R, K].

    Returns scale/zp broadcastable against x after appropriate reshaping, plus
    a function mapping x to per-cell groups for sums.
    """
    qmax = float(config.qmax)
    qmin = float(config.qmin)
    g = config.granularity
    eps = 1e-12

    if g == QuantGranularity.TENSOR:
        red_axes = tuple(range(x.ndim))
        sel = x
    elif g == QuantGranularity.ROW:
        red_axes = (-1,)
        sel = x
    elif g == QuantGranularity.CHANNEL:
        red_axes = (-2,)
        sel = x
    elif g == QuantGranularity.BLOCK:
        k = x.shape[-1]
        bs = config.block_size
        if k % bs:
            raise ValueError(f"K={k} not divisible by block_size={bs}")
        sel = x.reshape(*x.shape[:-1], k // bs, bs)
        # reduce over rows and within-block: blocks shared across rows
        red_axes = (-3, -1) if x.ndim >= 2 else (-1,)
    elif g == QuantGranularity.BLOCK_2D:
        r, k = x.shape[-2], x.shape[-1]
        br, bs = config.block_rows, config.block_size
        if r % br or k % bs:
            raise ValueError(f"shape ({r},{k}) not divisible by block ({br},{bs})")
        sel = x.reshape(*x.shape[:-2], r // br, br, k // bs, bs)
        red_axes = (-3, -1)
    else:
        raise NotImplementedError(g)

    if config.strategy == QuantStrategy.SYMMETRIC:
        absmax = jnp.max(jnp.abs(sel), axis=red_axes, keepdims=True)
        scale = jnp.maximum(absmax, eps) / qmax
        zp = jnp.zeros_like(scale, dtype=jnp.int32)
        centered = sel
    elif config.strategy == QuantStrategy.CENTERED:
        mean = jnp.mean(sel, axis=red_axes, keepdims=True)
        centered = sel - mean
        absmax = jnp.max(jnp.abs(centered), axis=red_axes, keepdims=True)
        scale = jnp.maximum(absmax, eps) / qmax
        zp = jnp.round(-mean / scale).astype(jnp.int32)
        centered = sel
    elif config.strategy == QuantStrategy.ASYMMETRIC:
        hi = jnp.max(sel, axis=red_axes, keepdims=True)
        lo = jnp.min(sel, axis=red_axes, keepdims=True)
        scale = jnp.maximum(hi - lo, eps) / (qmax - qmin)
        zp = (qmin - jnp.round(lo / scale)).astype(jnp.int32)
        centered = sel
    else:
        raise NotImplementedError(config.strategy)
    return sel, scale, zp


def quantize(x: jnp.ndarray, config: QuantConfig) -> QuantizedTensor:
    """Quantize ``x`` (any [..., R, K]-shaped float array)."""
    if x.ndim < 2:
        x = x.reshape(1, -1)
    xf = x.astype(jnp.float32)
    sel, scale, zp = _scale_reduce(xf, config)

    q = jnp.round(sel / scale + zp.astype(jnp.float32))
    q = jnp.clip(q, config.qmin, config.qmax).astype(jnp.int32)

    sums = None
    if config.compute_sums:
        g = config.granularity
        if g == QuantGranularity.TENSOR:
            sums = jnp.sum(q).reshape(1, 1)
        elif g == QuantGranularity.ROW:
            sums = jnp.sum(q, axis=-1, keepdims=True)
        elif g == QuantGranularity.CHANNEL:
            sums = jnp.sum(q, axis=-2, keepdims=True)
        elif g == QuantGranularity.BLOCK:
            sums = jnp.sum(q, axis=(-3, -1) if x.ndim >= 2 else (-1,), keepdims=True)
        elif g == QuantGranularity.BLOCK_2D:
            sums = jnp.sum(q, axis=(-3, -1), keepdims=True)
        sums = _squeeze_cells(sums, config, x.shape)

    q = q.reshape(x.shape)
    scale_out = _squeeze_cells(scale, config, x.shape).astype(jnp.float32)
    zp_out = _squeeze_cells(zp, config, x.shape)

    if config.bits == 4:
        data = pack_int4(q)
    else:
        data = q.astype(jnp.int8)
    return QuantizedTensor(
        data=data,
        scale=scale_out,
        zero_point=zp_out,
        sums=sums,
        config=config,
        shape=tuple(x.shape),
        orig_dtype=x.dtype,
    )


def _squeeze_cells(arr, config: QuantConfig, xshape):
    """Normalize per-cell arrays to the canonical shapes documented on
    QuantizedTensor."""
    g = config.granularity
    if g == QuantGranularity.TENSOR:
        return arr.reshape(1, 1)
    if g == QuantGranularity.ROW:
        return arr.reshape(*xshape[:-1], 1)
    if g == QuantGranularity.CHANNEL:
        lead = xshape[:-2] if len(xshape) >= 2 else ()
        return arr.reshape(*lead, 1, xshape[-1])
    if g == QuantGranularity.BLOCK:
        nb = xshape[-1] // config.block_size
        lead = xshape[:-2] if len(xshape) >= 2 else ()
        return arr.reshape(*lead, 1, nb)
    if g == QuantGranularity.BLOCK_2D:
        nb = xshape[-1] // config.block_size
        nr = xshape[-2] // config.block_rows
        return arr.reshape(*xshape[:-2], nr, nb)[..., :, :]
    raise NotImplementedError(g)


def _broadcast_cells(arr, config: QuantConfig, xshape):
    """Expand canonical per-cell arrays to full element shape for dequant."""
    g = config.granularity
    if g == QuantGranularity.TENSOR:
        return arr.reshape((1,) * len(xshape))
    if g in (QuantGranularity.ROW, QuantGranularity.CHANNEL):
        return arr
    if g == QuantGranularity.BLOCK:
        out = jnp.repeat(arr, config.block_size, axis=-1)
        return out  # [..., 1, K] broadcasts over rows
    if g == QuantGranularity.BLOCK_2D:
        out = jnp.repeat(arr, config.block_rows, axis=-2)
        out = jnp.repeat(out, config.block_size, axis=-1)
        return out
    raise NotImplementedError(g)


def dequantize(t: QuantizedTensor) -> jnp.ndarray:
    """Reconstruct float32: ``x = (q − zp) · scale``."""
    if t.bits == 4:
        q = unpack_int4(t.data).astype(jnp.int32)
    else:
        q = t.data.astype(jnp.int32)
    q = q.reshape(t.shape)
    scale = _broadcast_cells(t.scale, t.config, t.shape)
    zp = _broadcast_cells(t.zero_point, t.config, t.shape)
    return (q - zp).astype(jnp.float32) * scale
