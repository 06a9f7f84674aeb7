"""Quantization data-model tests (tier 1+2, SURVEY.md §4).

Round-trip tolerance parity with the reference:
``QuantizedAttentionTest`` round-trips quantize/dequantize with a 2·scale
tolerance (:61-161); blockwise compensation golden math per
``BlockwiseCompensationTest.swift``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.quant import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
    dequantize,
    quantize,
    pack_int4,
    unpack_int4,
)
from metal_flash_attention_plus_tpu.quant.compensation import (
    compensated_gemm_reference,
    dequantized_gemm_reference,
)
from metal_flash_attention_plus_tpu.quant.params import optimal_block_size
from metal_flash_attention_plus_tpu.quant.ste import fake_quantize


def _roundtrip_bound(qt):
    from metal_flash_attention_plus_tpu.quant.tensor import _broadcast_cells

    scale = _broadcast_cells(qt.scale, qt.config, qt.shape)
    return np.broadcast_to(np.asarray(scale), qt.shape)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize(
    "granularity,block",
    [
        (QuantGranularity.TENSOR, {}),
        (QuantGranularity.ROW, {}),
        (QuantGranularity.BLOCK, dict(block_size=16)),
        (QuantGranularity.BLOCK_2D, dict(block_size=16, block_rows=8)),
    ],
    ids=["tensor", "row", "block", "block2d"],
)
@pytest.mark.parametrize(
    "strategy",
    [QuantStrategy.SYMMETRIC, QuantStrategy.CENTERED, QuantStrategy.ASYMMETRIC],
)
def test_roundtrip(bits, granularity, block, strategy):
    cfg = QuantConfig(bits=bits, granularity=granularity, strategy=strategy, **block)
    x = jax.random.normal(jax.random.key(0), (32, 64)) * 3.0 + 1.5
    qt = quantize(x, cfg)
    y = dequantize(qt)
    assert y.shape == x.shape
    # Reference round-trip gate: error <= 2 * scale elementwise.
    err = np.abs(np.asarray(y - x))
    bound = 2.0 * _roundtrip_bound(qt) + 1e-6
    assert (err <= bound).all(), f"max violation {np.max(err - bound)}"


def test_int4_pack_unpack_exact():
    q = jnp.arange(-8, 8, dtype=jnp.int8).reshape(2, 8)
    packed = pack_int4(q)
    assert packed.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(q))


def test_symmetric_zero_point_is_zero():
    cfg = QuantConfig(bits=8, strategy=QuantStrategy.SYMMETRIC)
    qt = quantize(jax.random.normal(jax.random.key(1), (16, 16)), cfg)
    assert int(jnp.max(jnp.abs(qt.zero_point))) == 0


def test_centered_zero_point_tracks_mean():
    cfg = QuantConfig(bits=8, strategy=QuantStrategy.CENTERED)
    x = jax.random.normal(jax.random.key(2), (64, 64)) + 10.0
    qt = quantize(x, cfg)
    # zp = round(-mean/scale): with a +10 mean shift, zp must be strongly
    # negative, and the round trip still holds.
    assert int(qt.zero_point.reshape(())) < -50
    err = np.abs(np.asarray(dequantize(qt) - x))
    assert err.max() <= 2.0 * float(qt.scale.reshape(())) + 1e-6


def test_blockwise_compensation_matches_dequantized_gemm():
    # The compensation identity: int8 MXU accumulation + per-block correction
    # == dequantize-then-matmul (BlockwiseCompensationTest.swift:10-17).
    cfg = QuantConfig(
        bits=8,
        granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.CENTERED,
        block_size=16,
        compute_sums=True,
    )
    ka, kb = jax.random.split(jax.random.key(3))
    a = quantize(jax.random.normal(ka, (24, 64)) + 0.7, cfg)
    b = quantize(jax.random.normal(kb, (40, 64)) - 0.3, cfg)  # Bᵀ layout [N, K]
    ref = dequantized_gemm_reference(a, b)
    comp = compensated_gemm_reference(a, b)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_blockwise_compensation_int4():
    cfg = QuantConfig(
        bits=4,
        granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.SYMMETRIC,
        block_size=16,
    )
    ka, kb = jax.random.split(jax.random.key(4))
    a = quantize(jax.random.normal(ka, (16, 32)), cfg)
    b = quantize(jax.random.normal(kb, (16, 32)), cfg)  # Bᵀ layout [N, K]
    np.testing.assert_allclose(
        np.asarray(compensated_gemm_reference(a, b)),
        np.asarray(dequantized_gemm_reference(a, b)),
        rtol=1e-5,
        atol=1e-4,
    )


def test_precomputed_sums_match():
    cfg = QuantConfig(
        bits=8,
        granularity=QuantGranularity.BLOCK,
        block_size=16,
        compute_sums=True,
    )
    x = jax.random.normal(jax.random.key(5), (8, 48))
    qt = quantize(x, cfg)
    assert qt.sums is not None
    q = np.asarray(qt.data, dtype=np.int64).reshape(8, 3, 16)
    np.testing.assert_array_equal(
        np.asarray(qt.sums).reshape(3), q.sum(axis=(0, 2))
    )


def test_optimal_block_size():
    assert optimal_block_size(1024) == 256
    assert optimal_block_size(96) == 32
    assert optimal_block_size(100) in (16, 32, 64, 128, 256)


def test_quantized_tensor_is_pytree():
    cfg = QuantConfig(bits=8)
    qt = quantize(jnp.ones((8, 8)), cfg)
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) >= 3  # data, scale, zp

    @jax.jit
    def f(t):
        return dequantize(t).sum()

    assert np.isfinite(float(f(qt)))


def test_ste_gradients():
    cfg = QuantConfig(bits=8)
    x = jnp.linspace(-2.0, 2.0, 64).reshape(8, 8)

    def loss(x_):
        return jnp.sum(fake_quantize(x_, cfg) ** 2)

    g = jax.grad(loss)(x)
    # In-range elements pass gradient ~2x; none are clipped for symmetric
    # quant of a symmetric tensor.
    assert np.isfinite(np.asarray(g)).all()
    inner = np.asarray(g)[2:6, 2:6]
    assert (np.abs(inner) > 0).any()
