"""W8A8 model inference: quantized-weight forward vs the float model.

Gates follow the reference's quantized accuracy ladder: int8 end-to-end
logits within a few percent relative error; greedy decoding mostly
agrees with the float model."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from metal_flash_attention_plus_tpu.models.quantized_inference import (
    memory_footprint,
    quantize_weights,
    quantized_forward,
)
from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes

CFG = TransformerConfig(
    vocab_size=512,
    d_model=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=32,
    d_ff=256,
    max_seq=256,
    dtype=jnp.float32,
    block_sizes=BlockSizes(
        block_q=128, block_kv=128, block_q_dkv=128, block_kv_dkv=128,
        block_q_dq=128, block_kv_dq=128,
    ),
)


@pytest.mark.slow
def test_w8a8_forward_close_to_float():
    params = init_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_weights(params)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 512)
    lf = forward(params, toks, CFG)
    lq = quantized_forward(qparams, toks, CFG)
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.05, rel  # int8 gate

    # Greedy argmax agreement (the serving-relevant metric).  A random-
    # init model has near-tied logits (range ±4 over 512 classes), the
    # worst case for argmax stability — trained models separate more.
    agree = float(
        jnp.mean(jnp.argmax(lq, -1) == jnp.argmax(lf, -1))
    )
    assert agree > 0.85, agree


@pytest.mark.slow
def test_w8a8_with_quantized_kv_attention():
    params = init_params(CFG, jax.random.PRNGKey(2))
    qparams = quantize_weights(params)
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 64), 0, 512)
    lf = forward(params, toks, CFG)
    lq = quantized_forward(qparams, toks, CFG, quantize_kv=True)
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.08, rel  # weights + activations + KV all int8


def test_w8_memory_compression():
    params = init_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_weights(params)
    fb = memory_footprint(params)["total_bytes"]
    qb = memory_footprint(qparams)["total_bytes"]
    # fp32 params → int8 projections: projections dominate, expect >2.5×.
    assert qb < fb / 2.5, (fb, qb)


@pytest.mark.slow
def test_w8a8_causality():
    params = init_params(CFG, jax.random.PRNGKey(4))
    qparams = quantize_weights(params)
    toks = jax.random.randint(jax.random.PRNGKey(5), (1, 48), 0, 512)
    l1 = quantized_forward(qparams, toks, CFG)
    toks2 = toks.at[0, 40].set((toks[0, 40] + 1) % 512)
    l2 = quantized_forward(qparams, toks2, CFG)
    np.testing.assert_allclose(
        np.asarray(l1[:, :40]), np.asarray(l2[:, :40]), atol=1e-5
    )


@pytest.mark.slow
def test_w8a8_packed_d64_attention():
    # PACKED head-pair layout end-to-end (round 5): Q produced packed
    # straight from the projection, rope applied lane-locally, O consumed
    # packed by wo — zero per-call pack/unpack.  Numerics must stay within
    # the all-int8 gate vs the float model.
    cfg = TransformerConfig(
        vocab_size=256, d_model=128, num_layers=1, num_heads=2,
        num_kv_heads=2, head_dim=64, d_ff=256, max_seq=128,
        dtype=jnp.float32,
        block_sizes=BlockSizes(block_q=128, block_kv=128),
    )
    params = init_params(cfg, jax.random.PRNGKey(6))
    qparams = quantize_weights(params)
    toks = jax.random.randint(jax.random.PRNGKey(7), (1, 128), 0, 256)
    lf = forward(params, toks, cfg)
    lq = quantized_forward(qparams, toks, cfg, quantize_kv=True)  # auto
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.08, rel
    # NOTE strict prefix invariance does NOT hold here: runtime CHANNEL
    # quantization computes scales over the whole sequence, so a future
    # token moves past tokens' quantization grid (a property of runtime
    # per-channel quantization, not of the mask).  Kernel-level causal
    # correctness of the packed path is covered in
    # tests/test_quantized_attention.py::test_packed_layout_* (fixed
    # quantized KV).  Here just bound the prefix drift by the
    # quantization step.
    toks2 = toks.at[0, 100].set((toks[0, 100] + 1) % 256)
    lq2 = quantized_forward(qparams, toks2, cfg, quantize_kv=True)
    drift = float(
        jnp.linalg.norm(lq[:, :100] - lq2[:, :100])
        / jnp.linalg.norm(lq[:, :100])
    )
    assert drift < 0.02, drift
