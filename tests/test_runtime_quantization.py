"""Fused runtime quantizer vs the jnp golden.

Contract (module docstring of ops/runtime_quantization.py): payload and
zero-point BIT-EXACT; scales within float reduction-order noise (~1 ulp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.ops.runtime_quantization import (
    runtime_quantize,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
    int8_blockwise,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize

CONFIGS = [
    int8_blockwise(64),
    int8_blockwise(128),
    QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.SYMMETRIC, block_size=64,
    ),
    QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.ASYMMETRIC, block_size=64,
    ),
    QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.CENTERED, compute_sums=True,
    ),
    QuantConfig(bits=8, granularity=QuantGranularity.ROW),
    QuantConfig(
        bits=4, granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.CENTERED, block_size=128,
    ),
]


@pytest.mark.parametrize(
    "cfg", CONFIGS,
    ids=lambda c: f"{c.bits}b-{c.granularity.value}-{c.strategy.value}",
)
def test_fused_matches_golden(cfg):
    x = jax.random.normal(jax.random.PRNGKey(0), (512, 512), jnp.float32)
    x = x * 3.0 + 0.7  # non-zero mean exercises centering/zero points
    fused = runtime_quantize(x, cfg)
    gold = quantize(x, cfg)
    np.testing.assert_array_equal(np.asarray(fused.data), np.asarray(gold.data))
    np.testing.assert_array_equal(
        np.asarray(fused.zero_point), np.asarray(gold.zero_point)
    )
    np.testing.assert_allclose(
        np.asarray(fused.scale), np.asarray(gold.scale), rtol=1e-6
    )
    if cfg.compute_sums:
        np.testing.assert_array_equal(
            np.asarray(fused.sums), np.asarray(gold.sums)
        )


def test_fused_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 256), jnp.float32)
    cfg = int8_blockwise(64)
    t = runtime_quantize(x, cfg)
    err = jnp.max(jnp.abs(t.dequantize() - x))
    # One quantization step of the coarsest block (reference tests allow
    # 2·scale; dequant error is ≤ scale/2 plus centering offset).
    assert float(err) <= 2.0 * float(jnp.max(t.scale)), float(err)


def test_tensor_granularity_falls_back():
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 64), jnp.float32)
    cfg = QuantConfig(bits=8)
    fused = runtime_quantize(x, cfg)
    gold = quantize(x, cfg)
    np.testing.assert_array_equal(np.asarray(fused.data), np.asarray(gold.data))
