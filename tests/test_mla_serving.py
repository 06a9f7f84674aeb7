"""MLA serving: latent-cache decode vs the uncached MLA forward, and
token-exact greedy generation through the engine with the MLA executor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.models.mla_transformer import (
    MLAConfig,
    init_mla_params,
    mla_forward,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes

CFG = MLAConfig(
    vocab_size=128,
    d_model=64,
    num_layers=2,
    num_heads=2,
    head_dim=32,
    latent_dim=64,
    rope_dim=16,
    d_ff=128,
    max_seq=256,
    dtype=jnp.float32,
    block_sizes=BlockSizes(
        block_q=128, block_kv=128, block_q_dkv=128, block_kv_dkv=128,
        block_q_dq=128, block_kv_dq=128,
    ),
)


def test_mla_forward_runs_and_is_causal():
    params = init_mla_params(CFG, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 48), 0, 128)
    fwd = jax.jit(lambda t: mla_forward(params, t, CFG))  # 1 trace, 2 calls
    logits = fwd(toks)
    assert logits.shape == (1, 48, 128)
    # Causality: changing a future token must not change earlier logits.
    toks2 = toks.at[0, 40].set((toks[0, 40] + 1) % 128)
    logits2 = fwd(toks2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :40]), np.asarray(logits2[:, :40]), atol=1e-5
    )
    assert not np.allclose(
        np.asarray(logits[:, 40:]), np.asarray(logits2[:, 40:]), atol=1e-5
    )


def _uncached_greedy(params, prompt, n_tokens):
    toks = list(prompt)
    for _ in range(n_tokens):
        logits = mla_forward(params, jnp.asarray(toks, jnp.int32)[None], CFG)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.mark.slow
def test_mla_engine_matches_uncached_greedy():
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
        mla_executor,
    )

    params = init_mla_params(CFG, jax.random.PRNGKey(0))
    prompts = {
        1: [5, 9, 17, 3, 22, 8, 1],
        2: [100, 42],
        3: [7] * 19,  # multi-chunk with chunk_size=16
    }
    engine = ServingEngine(
        params, CFG, num_pages=32, page_tokens=16, max_batch=2,
        cache_dtype=jnp.float32, chunk_size=16, executor=mla_executor(),
    )
    for rid, p in prompts.items():
        engine.submit(GenerationRequest(rid, p, max_new_tokens=5))
    out = engine.run()

    for rid, p in prompts.items():
        expect = _uncached_greedy(params, p, 5)
        assert out[rid] == expect, (rid, out[rid], expect)


def test_mla_cache_width_advantage():
    # The point of the latent cache: per-token state is d_c + d_r vs
    # 2·H·d_h for an equivalent GQA layout.
    assert CFG.cache_width == 80
    gqa_equiv = 2 * CFG.num_heads * CFG.head_dim
    assert CFG.cache_width < gqa_equiv / 1.5


@pytest.mark.slow
def test_mla_engine_quantized_latent_cache():
    """Compressed + quantized: int8 latent pages (d_c + d_r BYTES/token).
    Greedy tokens should agree closely with the float-cache engine."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
        mla_executor,
    )

    params = init_mla_params(CFG, jax.random.PRNGKey(0))
    prompts = {1: [5, 9, 17, 3, 22, 8, 1], 2: [7] * 19}
    outs = {}
    for quant in (False, True):
        engine = ServingEngine(
            params, CFG, num_pages=32, page_tokens=16, max_batch=2,
            cache_dtype=jnp.float32, executor=mla_executor(),
            quantized_cache=quant,
        )
        for rid, p in prompts.items():
            engine.submit(GenerationRequest(rid, p, max_new_tokens=5))
        outs[quant] = engine.run()
    agree = sum(
        a == b
        for rid in prompts
        for a, b in zip(outs[False][rid], outs[True][rid])
    )
    total = sum(len(outs[False][rid]) for rid in prompts)
    assert agree / total >= 0.8, (outs[False], outs[True])


@pytest.mark.slow
def test_mla_engine_with_quantized_weights():
    """Compressed cache + W8A8 weights: the MLA executors run int8
    projections through the polymorphic ``linear`` (quantize_mla_weights);
    greedy tokens must exactly match the uncached quantized MLA forward."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.models.quantized_inference import (
        quantize_mla_weights,
    )
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
        mla_executor,
    )

    params = init_mla_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_mla_weights(params)

    prompts = {1: [5, 9, 17, 3], 2: [100, 42]}
    engine = ServingEngine(
        qparams, CFG, num_pages=32, page_tokens=16, max_batch=2,
        cache_dtype=jnp.float32, chunk_size=16, executor=mla_executor(),
    )
    for rid, p in prompts.items():
        engine.submit(GenerationRequest(rid, p, max_new_tokens=4))
    out = engine.run()
    for rid, p in prompts.items():
        expect = _uncached_greedy(qparams, p, 4)
        assert out[rid] == expect, (rid, out[rid], expect)
