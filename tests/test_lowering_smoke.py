"""Mosaic lowering smoke (VERDICT r1 item 10).

CI runs kernels in interpreter mode only, so schedule/lowering regressions
(ops Mosaic cannot lower, bad block shapes) were invisible until the next
hardware round.  ``jax.export`` with ``platforms=["tpu"]`` runs the FULL
TPU lowering pipeline (StableHLO + serialized Mosaic kernel modules) on any
host — no TPU needed — and fails loudly on unlowerable kernels.  It does
not execute anything.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize


def _export_tpu(fn, *args):
    exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exported.mlir_module() is not None


B, H, S, D = 1, 2, 512, 128


def _qkv(dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(
        jax.random.normal(k, (B, H, S, D), dtype) for k in ks
    )


def test_forward_kernel_lowers_for_tpu():
    q, k, v = _qkv()
    _export_tpu(
        lambda q, k, v: flash_attention_forward(
            q, k, v, mask=CAUSAL, interpret=False
        )[0],
        q, k, v,
    )


def test_backward_kernels_lower_for_tpu():
    q, k, v = _qkv()

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, mask=CAUSAL, interpret=False) ** 2
        )

    _export_tpu(jax.grad(loss, argnums=(0, 1, 2)), q, k, v)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_forward_lowers_for_tpu(bits):
    q, k, v = _qkv(jnp.float32)
    cfg = QuantConfig(
        bits=bits, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.CENTERED,
    )
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    _export_tpu(
        lambda q: quantized_flash_attention_forward(
            q, kq, vq, mask=CAUSAL, interpret=False
        )[0],
        q.astype(jnp.bfloat16),
    )


def test_block2d_quantized_forward_lowers_for_tpu():
    q, k, v = _qkv(jnp.float32)
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK_2D,
        strategy=QuantStrategy.CENTERED, block_rows=8, block_size=32,
    )
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    _export_tpu(
        lambda q: quantized_flash_attention_forward(
            q, kq, vq, mask=CAUSAL, interpret=False
        )[0],
        q.astype(jnp.bfloat16),
    )
