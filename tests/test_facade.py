"""L5 dispatch facades: MultiHeadAttention / QuantizedAttention / tuner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention import (
    CAUSAL,
    AttentionDescriptor,
    AttentionTuner,
    CalibrationStore,
    MultiHeadAttention,
    QuantizedAttention,
    QuantizedAttentionConfig,
)
from metal_flash_attention_plus_tpu.attention.tuning import (
    TuneKey,
    default_block_sizes,
)
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
)


def _data(hq=4, hkv=2, s=256, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(ks[0], (1, hq, s, d), jnp.float32),
        jax.random.normal(ks[1], (1, hkv, s, d), jnp.float32),
        jax.random.normal(ks[2], (1, hkv, s, d), jnp.float32),
    )


def test_multi_head_forward_and_backward():
    q, k, v = _data()
    desc = AttentionDescriptor(head_dim=64, num_q_heads=4, num_kv_heads=2, mask=CAUSAL)
    mha = MultiHeadAttention(desc)
    o, l = mha.forward(q, k, v)
    o_ref, l_ref = reference_attention(q, k, v, mask=CAUSAL)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1e-5)

    do = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)
    dq, dk, dv = mha.backward(q, k, v, o, l, do)
    g = jax.grad(
        lambda q, k, v: jnp.vdot(
            reference_attention(q, k, v, mask=CAUSAL)[0], do
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip((dq, dk, dv), g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_multi_head_validates_shapes():
    q, k, v = _data()
    desc = AttentionDescriptor(head_dim=64, num_q_heads=8, num_kv_heads=2)
    with pytest.raises(ValueError, match="head counts"):
        MultiHeadAttention(desc).forward(q, k, v)


def test_quantized_attention_facade():
    q, k, v = _data(seed=3)
    qa = QuantizedAttention(
        config=QuantizedAttentionConfig(key_bits=8, value_bits=8),
        mask=CAUSAL,
    )
    o = qa(q, k, v)
    o_ref, _ = reference_attention(q, k, v, mask=CAUSAL)
    rel = float(jnp.linalg.norm(o - o_ref) / jnp.linalg.norm(o_ref))
    assert rel < 0.05, rel

    kq, vq = qa.quantize_kv(k, v)
    o2 = qa.forward_quantized(q, kq, vq)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o2), atol=1e-6)


def test_config_json_roundtrip():
    cfg = QuantizedAttentionConfig(key_bits=4, value_bits=8, per_tensor=True)
    rt = QuantizedAttentionConfig.from_json(cfg.to_json())
    assert rt == cfg


def test_tuner_store_roundtrip(tmp_path):
    store = CalibrationStore(cache_dir=str(tmp_path))
    tuner = AttentionTuner(store=store)
    key = TuneKey("fwd", 64, 16, 4096)
    blocks = default_block_sizes(64)
    tuner.record(key, blocks, 123.4)
    # Fresh tuner reloads from disk.
    tuner2 = AttentionTuner(store=store)
    got = tuner2.recommend("fwd", 64, 4096)
    assert got == blocks
    # Unknown key falls back to the cold-start table — which since
    # round 5 carries the device-generation dimension (on the CPU test
    # backend the device kind is unknown → conservative slab).
    assert tuner2.recommend("fwd", 256, 1024) == default_block_sizes(
        256, device_kind=tuner2._device_kind()
    )
