"""FWHT rotation: Hadamard-matrix parity, involution, and the quantization
outlier-smoothing win it exists for (``HadamardRotation.swift`` analog)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from scipy.linalg import hadamard

from metal_flash_attention_plus_tpu.ops.hadamard import (
    dequantize_unrotate,
    hadamard_transform,
    rotate_quantize,
)
from metal_flash_attention_plus_tpu.quant.params import QuantConfig


def test_matches_hadamard_matrix():
    n = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (8, n), jnp.float32)
    got = hadamard_transform(x, n)
    h = hadamard(n).astype(np.float32) / np.sqrt(n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x) @ h, atol=1e-5)


def test_involution():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.float32)
    rt = hadamard_transform(hadamard_transform(x))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def test_blocked_transform():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 512), jnp.float32)
    got = hadamard_transform(x, block_size=128)
    h = hadamard(128).astype(np.float32) / np.sqrt(128)
    ref = (np.asarray(x).reshape(2, 4, 128) @ h).reshape(2, 512)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


@pytest.mark.slow
def test_outlier_smoothing_reduces_quant_error():
    # A tensor with a few large outliers: rotation spreads them, so
    # per-tensor int8 quantization error drops (the ConvRot motivation).
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (64, 256), jnp.float32)
    x = x.at[:, 7].mul(50.0)  # outlier channel
    cfg = QuantConfig(bits=8)

    from metal_flash_attention_plus_tpu.quant.tensor import dequantize, quantize

    err_plain = float(jnp.mean(jnp.abs(dequantize(quantize(x, cfg)) - x)))
    t, bs = rotate_quantize(x, cfg)
    err_rot = float(jnp.mean(jnp.abs(dequantize_unrotate(t, bs) - x)))
    assert err_rot < err_plain * 0.5, (err_rot, err_plain)
