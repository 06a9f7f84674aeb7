"""3D-parallel SPMD transformer vs the single-device golden model.

Validates the whole distributed stack numerically: DP×TP×CP shard_map
forward, vocab-sharded cross entropy, and the explicit gradient
synchronization (psum_id + per-param replication-axis psums) against
``jax.grad`` of the unsharded model.  Runs on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
    loss_fn,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes
from metal_flash_attention_plus_tpu.parallel.mesh import make_mesh
from metal_flash_attention_plus_tpu.parallel.spmd import (
    ShardingConfig,
    make_spmd_loss_and_grad,
    shard_params,
    spmd_forward,
)

CFG = TransformerConfig(
    vocab_size=512,
    d_model=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq=256,
    dtype=jnp.float32,
    block_sizes=BlockSizes(
        block_q=128, block_kv=128,
        block_q_dkv=128, block_kv_dkv=128,
        block_q_dq=128, block_kv_dq=128,
    ),
)


def _setup(mesh_shape, seed=0):
    if len(jax.devices()) < int(np.prod(mesh_shape)):
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(*mesh_shape)
    params = init_params(CFG, jax.random.PRNGKey(seed))
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (2, 257), 0, CFG.vocab_size
    )
    return mesh, params, tokens


@pytest.mark.parametrize(
    "mesh_shape,attn_mode",
    [
        # Default tier keeps one ring + the local mode; the remaining
        # mesh shapes run in the slow tier (MFA_SLOW_TESTS=1, CI).
        pytest.param((2, 2, 2), "ring", marks=pytest.mark.slow),
        pytest.param((1, 2, 4), "ring", marks=pytest.mark.slow),
        pytest.param((2, 2, 2), "ulysses", marks=pytest.mark.slow),
        ((2, 2, 1), "local"),
    ],
)
def test_spmd_loss_and_grads_match_golden(mesh_shape, attn_mode):
    mesh, params, tokens = _setup(mesh_shape)
    sc = ShardingConfig(attn_mode=attn_mode)
    sharded = shard_params(params, mesh, CFG, sc)
    inputs, targets = tokens[:, :-1], tokens[:, 1:]

    f = jax.jit(make_spmd_loss_and_grad(CFG, mesh, sc))
    loss, grads = f(sharded, inputs, targets)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, tokens, CFG)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)

    flat, _ = jax.tree.flatten(grads)
    flat_ref, _ = jax.tree.flatten(grads_ref)
    for g, gr in zip(flat, flat_ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), atol=3e-4, rtol=1e-3
        )


@pytest.mark.slow
def test_spmd_forward_matches_golden():
    mesh, params, tokens = _setup((2, 2, 2), seed=4)
    sc = ShardingConfig(attn_mode="ring")
    sharded = shard_params(params, mesh, CFG, sc)
    inputs = tokens[:, :-1]
    logits = spmd_forward(sharded, inputs, CFG, mesh, sc)
    logits_ref = forward(params, inputs, CFG)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), atol=2e-4, rtol=1e-3
    )
