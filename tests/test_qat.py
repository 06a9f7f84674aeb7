"""End-to-end QAT: train with fake-quantized weights/activations through the
flash-attention path (STE gradients) — the in-repo replacement for the
reference's external PyTorch autograd bridge
(``QuantizedAttention.swift:1542-1556``)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.ste import fake_quantize

BS = BlockSizes(
    block_q=128, block_kv=128, block_q_dkv=128, block_kv_dkv=128,
    block_q_dq=128, block_kv_dq=128,
)
ROW8 = QuantConfig(
    bits=8, granularity=QuantGranularity.ROW, strategy=QuantStrategy.CENTERED
)


@pytest.mark.slow
def test_qat_through_quantized_attention_path():
    """A tiny attention regressor trained with int8 fake-quant on K/V: the
    STE must pass useful gradients (loss decreases >5×) and the final
    weights must work when ACTUALLY quantized (the QAT promise)."""
    d, s, h = 32, 128, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (1, s, d))
    target = jax.random.normal(ks[1], (1, h, s, d)) * 0.3
    params = dict(
        wq=jax.random.normal(ks[2], (d, h * d)) * d**-0.5,
        wkv=jax.random.normal(ks[3], (d, h * d)) * d**-0.5,
    )

    def attn_out(p, quantize_kv):
        q = (x @ p["wq"]).reshape(1, s, h, d).transpose(0, 2, 1, 3)
        kv = (x @ p["wkv"]).reshape(1, s, h, d).transpose(0, 2, 1, 3)
        if quantize_kv:
            kv = fake_quantize(kv, ROW8)
        return flash_attention(q, kv, kv, mask=CAUSAL, block_sizes=BS)

    def loss(p):
        return jnp.mean((attn_out(p, True) - target) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, st):
        g = jax.grad(loss)(p)
        updates, st = opt.update(g, st, p)
        return optax.apply_updates(p, updates), st

    first = float(loss(params))
    for _ in range(120):
        params, state = step(params, state)
    last = float(loss(params))
    assert last < first / 3, (first, last)

    # The QAT promise: really-quantized inference matches the fake-quant
    # training forward (same rounding), so the trained weights deploy.
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention,
    )
    from metal_flash_attention_plus_tpu.quant.tensor import quantize

    q = (x @ params["wq"]).reshape(1, s, h, d).transpose(0, 2, 1, 3)
    kv = (x @ params["wkv"]).reshape(1, s, h, d).transpose(0, 2, 1, 3)
    kv_q = quantize(kv, ROW8)
    o_deploy = quantized_flash_attention(
        q, kv_q, kv_q, mask=CAUSAL, block_sizes=BS
    )
    o_train = attn_out(params, True)
    np.testing.assert_allclose(
        np.asarray(o_deploy), np.asarray(o_train), atol=2e-5
    )


def test_ste_clips_out_of_range_gradients():
    cfg = QuantConfig(bits=8)
    x = jnp.asarray([0.01, 0.5, 1.0])  # scale set by max=1.0

    def f(x_):
        return jnp.sum(fake_quantize(x_, cfg))

    g = jax.grad(f)(x)
    # All in range (symmetric absmax covers max) → pass-through.
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
