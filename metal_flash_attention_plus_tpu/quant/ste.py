"""Straight-through estimator (STE) for QAT through quantized paths.

The reference deleted its naive in-repo STE backward generators and delegated
STE to an external PyTorch C++ autograd bridge
(``QuantizedAttention.swift:1542-1556``).  Per SURVEY.md §7 step 5, the TPU
build keeps STE *in-repo*: a ``jax.custom_vjp`` fake-quant whose backward is
the clipped pass-through (gradient 1 inside the representable range, 0
outside — the standard clipped STE).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.quant.params import QuantConfig
from metal_flash_attention_plus_tpu.quant.tensor import dequantize, quantize


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def fake_quantize(x: jnp.ndarray, config: QuantConfig) -> jnp.ndarray:
    """Quantize→dequantize round trip with STE gradients."""
    return dequantize(quantize(x, config)).astype(x.dtype)


def _fake_quantize_fwd(x, config):
    qt = quantize(x, config)
    y = dequantize(qt).astype(x.dtype)
    # Residual: the pass-through clip range per element.  Inside the
    # representable range the rounding error is < scale/2 and STE passes the
    # gradient; outside (clipped) the gradient is zero.
    in_range = jnp.abs(y - x.astype(jnp.float32)).astype(jnp.float32)
    max_err = _max_rounding_error(qt)
    passthrough = (in_range <= max_err).astype(x.dtype)
    return y, passthrough


def _max_rounding_error(qt):
    from metal_flash_attention_plus_tpu.quant.tensor import _broadcast_cells

    scale = _broadcast_cells(qt.scale, qt.config, qt.shape)
    return 0.5 * scale + 1e-8


def _fake_quantize_bwd(config, passthrough, g):
    return (g * passthrough,)


fake_quantize.defvjp(_fake_quantize_fwd, _fake_quantize_bwd)
