"""Flagship transformer sanity: shapes, determinism, and training signal."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
    loss_fn,
    make_train_step,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes

CFG = TransformerConfig(
    vocab_size=128,
    d_model=64,
    num_layers=2,
    num_heads=2,
    num_kv_heads=1,
    head_dim=32,
    d_ff=128,
    max_seq=128,
    dtype=jnp.float32,
    block_sizes=BlockSizes(
        block_q=128, block_kv=128,
        block_q_dkv=128, block_kv_dkv=128,
        block_q_dq=128, block_kv_dq=128,
    ),
)


def test_forward_shapes_and_determinism():
    params = init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 128)
    logits = forward(params, tokens, CFG)
    assert logits.shape == (2, 64, 128)
    assert logits.dtype == jnp.float32
    logits2 = forward(params, tokens, CFG)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


@pytest.mark.slow
def test_train_step_reduces_loss():
    params = init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 65), 0, 128)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(CFG, opt)

    first = float(loss_fn(params, tokens, CFG))
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, tokens)
    last = float(loss)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first - 0.1, (first, last)
