"""Hadamard rotation (FWHT) — outlier smoothing before quantization.

TPU-native redesign of ``Attention/HadamardRotation.swift:43-151``: the
reference JIT-generates a *one-thread-per-block sequential* Metal kernel for
an in-place FWHT over power-of-2 blocks (≤ 1024).  On TPU the transform is a
log2(n)-stage butterfly of full-width VPU adds — expressed in jnp and left
to XLA, which fuses the stages; a hand-written Pallas kernel would add
nothing (the op is a handful of elementwise passes over the tensor, purely
HBM-bound, and XLA already emits exactly that).

Orthonormal convention: each application scales by 1/sqrt(n), so the
transform is an involution (``hadamard_transform ∘ hadamard_transform =
identity``) — rotate → quantize → dequantize → rotate restores the original
basis (ConvRot/QuaRot-style usage).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from metal_flash_attention_plus_tpu.quant.params import QuantConfig
from metal_flash_attention_plus_tpu.quant.tensor import (
    QuantizedTensor,
    dequantize,
    quantize,
)

MAX_BLOCK = 1024  # reference's kernel limit; kept for parity


def hadamard_transform(
    x: jnp.ndarray, block_size: Optional[int] = None
) -> jnp.ndarray:
    """Blocked orthonormal FWHT along the last dim.

    ``block_size`` must be a power of 2 dividing the last dim (default: the
    largest power of 2 ≤ min(last_dim, 1024) that divides it — the
    reference's block selection).
    """
    n = x.shape[-1]
    if block_size is None:
        block_size = 1
        while (
            block_size * 2 <= min(n, MAX_BLOCK) and n % (block_size * 2) == 0
        ):
            block_size *= 2
    bs = block_size
    if bs & (bs - 1) or n % bs:
        raise ValueError(f"block_size {bs} must be a power of 2 dividing {n}")

    orig_dtype = x.dtype
    lead = x.shape[:-1]
    y = x.astype(jnp.float32).reshape(*lead, n // bs, bs)
    h = 1
    while h < bs:
        # Stride-h butterfly: within each group of 2h, (a, b) → (a+b, a−b).
        y = y.reshape(*lead, n // bs, bs // (2 * h), 2, h)
        a = y[..., 0, :]
        b = y[..., 1, :]
        y = jnp.concatenate([a + b, a - b], axis=-1)
        y = y.reshape(*lead, n // bs, bs)
        h *= 2
    y = y.reshape(*lead, n) * (float(bs) ** -0.5)
    return y.astype(orig_dtype)


def rotate_quantize(
    x: jnp.ndarray, config: QuantConfig, block_size: Optional[int] = None
) -> Tuple[QuantizedTensor, int]:
    """Rotate then quantize; returns (tensor, block_size used)."""
    n = x.shape[-1]
    if block_size is None:
        block_size = 1
        while (
            block_size * 2 <= min(n, MAX_BLOCK) and n % (block_size * 2) == 0
        ):
            block_size *= 2
    rotated = hadamard_transform(x, block_size)
    return quantize(rotated, config), block_size


def dequantize_unrotate(t: QuantizedTensor, block_size: int) -> jnp.ndarray:
    """Inverse of :func:`rotate_quantize` (FWHT is its own inverse)."""
    return hadamard_transform(dequantize(t), block_size)
