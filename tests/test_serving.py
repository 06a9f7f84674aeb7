"""Serving layer: paged decode kernel, KV cache scatter, engine end-to-end.

The load-bearing test: greedy generation through the paged continuous-
batching engine must produce EXACTLY the tokens of naive uncached greedy
decoding with the full forward — the strongest equivalence the serving
stack can have."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
)
from metal_flash_attention_plus_tpu.serving.kv_cache import (
    PagedKVCache,
    append_tokens,
    gather_kv,
    write_prompt,
)
from metal_flash_attention_plus_tpu.serving.paged_attention import (
    paged_decode_attention,
)

CFG = TransformerConfig(
    vocab_size=128,
    d_model=64,
    num_layers=2,
    num_heads=2,
    num_kv_heads=1,
    head_dim=32,
    d_ff=128,
    max_seq=256,
    dtype=jnp.float32,
    block_sizes=BlockSizes(
        block_q=128, block_kv=128,
        block_q_dkv=128, block_kv_dkv=128,
        block_q_dq=128, block_kv_dq=128,
    ),
)


def test_paged_decode_matches_reference():
    b, hq, hkv, d, pt, npages = 3, 4, 2, 64, 128, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    lengths = jnp.asarray([200, 1, 257], jnp.int32)
    max_len = 384
    q = jax.random.normal(ks[0], (b, hq, d), jnp.float32)
    k_full = jax.random.normal(ks[1], (b, hkv, max_len, d), jnp.float32)
    v_full = jax.random.normal(ks[2], (b, hkv, max_len, d), jnp.float32)

    # Scatter each sequence's KV into distinct pages.
    kv_pages = jnp.zeros((hkv, npages + 1, 2 * pt, d), jnp.float32)
    table = np.full((b, 3), npages, np.int32)  # trash by default
    phys = iter(range(npages))
    for i in range(b):
        n = -(-int(lengths[i]) // pt)
        ids = [next(phys) for _ in range(n)]
        table[i, :n] = ids
        for j, pid in enumerate(ids):
            lo, hi = j * pt, min((j + 1) * pt, max_len)
            kv_pages = kv_pages.at[:, pid, : hi - lo].set(
                k_full[i, :, lo:hi]
            ).at[:, pid, pt : pt + hi - lo].set(v_full[i, :, lo:hi])

    o = paged_decode_attention(
        q, kv_pages, jnp.asarray(table), lengths, page_tokens=pt
    )
    for i in range(b):
        n = int(lengths[i])
        o_ref, _ = reference_attention(
            q[i][None, :, None, :],  # [1, Hq, 1, D]
            k_full[i][None, :, :n],
            v_full[i][None, :, :n],
        )
        np.testing.assert_allclose(
            np.asarray(o[i]), np.asarray(o_ref[0, :, 0]), atol=2e-5,
            err_msg=f"seq {i}",
        )


def test_kv_cache_scatter_roundtrip():
    cache = PagedKVCache.create(1, 2, 8, 16, 32, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 32), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 32), jnp.float32)
    page_row = jnp.asarray([3, 5, 1, 8, 8, 8], jnp.int32)
    cache = write_prompt(cache, 0, k, v, page_row)
    kg, vg = gather_kv(cache, 0, page_row, 40)
    np.testing.assert_allclose(np.asarray(kg), np.asarray(k), atol=0)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(v), atol=0)

    # Append one token at position 40 for a batch of 1.
    knew = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 32), jnp.float32)
    cache = append_tokens(
        cache, 0, knew, knew, jnp.asarray([40]), page_row[None]
    )
    kg2, _ = gather_kv(cache, 0, page_row, 41)
    np.testing.assert_allclose(np.asarray(kg2[:, 40]), np.asarray(knew[0]))


def _uncached_greedy(params, prompt, n_tokens):
    toks = list(prompt)
    for _ in range(n_tokens):
        logits = forward(
            params, jnp.asarray(toks, jnp.int32)[None], CFG
        )
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.mark.parametrize(
    "chunk_size",
    [pytest.param(None, marks=pytest.mark.slow),
     pytest.param(16, marks=pytest.mark.slow)],
    ids=["one-chunk", "chunked"],
)
def test_engine_matches_uncached_greedy(chunk_size):
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    params = init_params(CFG, jax.random.PRNGKey(0))
    prompts = {
        1: [5, 9, 17, 3, 22, 8, 1],
        2: [100, 42],
        3: [7] * 19,  # > chunk_size=16 → exercises multi-chunk prefill
    }
    engine = ServingEngine(
        params, CFG, num_pages=32, page_tokens=16, max_batch=2,
        cache_dtype=jnp.float32, chunk_size=chunk_size,
    )
    for rid, p in prompts.items():
        engine.submit(GenerationRequest(rid, p, max_new_tokens=5))
    out = engine.run()

    for rid, p in prompts.items():
        expect = _uncached_greedy(params, p, 5)
        assert out[rid] == expect, (rid, out[rid], expect)


def test_paged_prefill_matches_reference():
    from metal_flash_attention_plus_tpu.serving.paged_attention import (
        paged_prefill_attention,
    )

    hq, hkv, d, pt, npages = 4, 2, 64, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    total, chunk = 150, 48  # chunk covers rows [102, 150)
    offset = total - chunk
    q = jax.random.normal(ks[0], (hq, chunk, d), jnp.float32)
    k_full = jax.random.normal(ks[1], (hkv, total, d), jnp.float32)
    v_full = jax.random.normal(ks[2], (hkv, total, d), jnp.float32)

    kv_pages = jnp.zeros((hkv, npages + 1, 2 * pt, d), jnp.float32)
    n = -(-total // pt)
    row = np.full(n + 1, npages, np.int32)
    row[:n] = np.arange(n)
    for j in range(n):
        lo, hi = j * pt, min((j + 1) * pt, total)
        kv_pages = kv_pages.at[:, j, : hi - lo].set(
            k_full[:, lo:hi]
        ).at[:, j, pt : pt + hi - lo].set(v_full[:, lo:hi])

    o = paged_prefill_attention(
        q, kv_pages, jnp.asarray(row), jnp.asarray(offset), page_tokens=pt
    )
    # Dense reference: rows at global positions offset..total-1, causal.
    from metal_flash_attention_plus_tpu.attention.masking import (
        MaskKind, MaskSpec,
    )

    o_ref, _ = reference_attention(
        q[None], k_full[None], v_full[None],
        mask=MaskSpec(kind=MaskKind.CAUSAL),
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref[0]), atol=2e-5
    )


def test_quantized_cache_decode_matches_dequant():
    """int8 paged decode vs dense reference on the dequantized cache."""
    from metal_flash_attention_plus_tpu.serving.kv_cache import (
        _quantize_tokens_sym,
    )

    b, hq, hkv, d, pt, npages = 2, 4, 2, 64, 64, 8
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    lengths = jnp.asarray([100, 33], jnp.int32)
    max_len = 128
    q = jax.random.normal(ks[0], (b, hq, d), jnp.float32)
    k_full = jax.random.normal(ks[1], (b, hkv, max_len, d), jnp.float32)
    v_full = jax.random.normal(ks[2], (b, hkv, max_len, d), jnp.float32)

    kq, kscale = _quantize_tokens_sym(k_full)
    vq, vscale = _quantize_tokens_sym(v_full)

    kv_pages = jnp.zeros((hkv, npages + 1, 2 * pt, d), jnp.int8)
    # Scale pools are LANE-major row vectors [Hkv, pages, 1, pt].
    ks_pages = jnp.zeros((hkv, npages + 1, 1, pt), jnp.float32)
    vs_pages = jnp.zeros_like(ks_pages)
    table = np.full((b, 2), npages, np.int32)
    phys = iter(range(npages))
    for i in range(b):
        n = -(-int(lengths[i]) // pt)
        ids = [next(phys) for _ in range(n)]
        table[i, :n] = ids
        for j, pid in enumerate(ids):
            lo, hi = j * pt, min((j + 1) * pt, max_len)
            kv_pages = kv_pages.at[:, pid, : hi - lo].set(
                kq[i, :, lo:hi]
            ).at[:, pid, pt : pt + hi - lo].set(vq[i, :, lo:hi])
            ks_pages = ks_pages.at[:, pid, 0, : hi - lo].set(
                kscale[i, :, lo:hi, 0]
            )
            vs_pages = vs_pages.at[:, pid, 0, : hi - lo].set(
                vscale[i, :, lo:hi, 0]
            )

    o = paged_decode_attention(
        q, kv_pages, jnp.asarray(table), lengths, page_tokens=pt,
        k_scales=ks_pages, v_scales=vs_pages,
    )
    kd = kq.astype(jnp.float32) * kscale
    vd = vq.astype(jnp.float32) * vscale
    for i in range(b):
        n = int(lengths[i])
        o_ref, _ = reference_attention(
            q[i][None, :, None, :], kd[i][None, :, :n], vd[i][None, :, :n]
        )
        np.testing.assert_allclose(
            np.asarray(o[i]), np.asarray(o_ref[0, :, 0]), atol=2e-5,
            err_msg=f"seq {i}",
        )


@pytest.mark.slow
def test_engine_with_quantized_cache():
    """End-to-end generation with an int8 paged cache: tokens should match
    the float-cache engine closely (int8 KV rel-err ~1%, greedy argmax is
    usually stable at tiny scale; require >= 80% token agreement)."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    params = init_params(CFG, jax.random.PRNGKey(0))
    prompts = {1: [5, 9, 17, 3, 22, 8, 1], 2: [7] * 19}

    outs = {}
    for quant in (False, True):
        engine = ServingEngine(
            params, CFG, num_pages=32, page_tokens=16, max_batch=2,
            cache_dtype=jnp.float32, quantized_cache=quant,
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
def test_engine_with_quantized_weights():
    """W8A8 weights in the serving executors (r1 item 6): the engine over
    ``quantize_weights`` params must reproduce greedy decoding of the
    UNCACHED quantized forward — the quantized twin of
    ``test_engine_matches_uncached_greedy``."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.models.quantized_inference import (
        quantized_forward,
        quantize_weights,
    )
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    params = init_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_weights(params)

    def _uncached_greedy_q(prompt, n):
        toks = list(prompt)
        for _ in range(n):
            logits = quantized_forward(
                qparams, jnp.asarray([toks]), CFG
            )
            toks.append(int(jnp.argmax(logits[0, -1])))
        return toks[len(prompt):]

    prompts = {1: [5, 9, 17, 3, 22, 8, 1], 2: [100, 42]}
    engine = ServingEngine(
        qparams, CFG, num_pages=32, page_tokens=16, max_batch=2,
        cache_dtype=jnp.float32, chunk_size=16,
    )
    for rid, p in prompts.items():
        engine.submit(GenerationRequest(rid, p, max_new_tokens=5))
    out = engine.run()
    for rid, p in prompts.items():
        expect = _uncached_greedy_q(p, 5)
        assert out[rid] == expect, (rid, out[rid], expect)


@pytest.mark.slow
def test_engine_with_w4a8_weights():
    """W4A8 weights in the serving executors: int4 projections (group-
    planar packed, in-kernel unpacked onto the int8 MXU) through the same
    polymorphic ``linear``.  Needs K % 256 == 0 — a 256-wide model."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.models.quantized_inference import (
        quantized_forward,
        quantize_weights,
    )
    from metal_flash_attention_plus_tpu.quant.params import (
        QuantConfig,
        QuantGranularity,
        QuantStrategy,
    )
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    # Every projection's contraction dim must be a multiple of 256 (the
    # int4 group-planar packing granularity): d_model = heads·head_dim =
    # d_ff = 256.
    cfg256 = TransformerConfig(
        vocab_size=128, d_model=256, num_layers=1, num_heads=8,
        num_kv_heads=2, head_dim=32, d_ff=256, max_seq=256,
        dtype=jnp.float32,
        block_sizes=CFG.block_sizes,
    )
    params = init_params(cfg256, jax.random.PRNGKey(1))
    cfg4 = QuantConfig(
        bits=4, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.SYMMETRIC,
    )
    qparams = quantize_weights(params, cfg4)

    def _uncached_greedy_q(prompt, n):
        toks = list(prompt)
        for _ in range(n):
            logits = quantized_forward(
                qparams, jnp.asarray([toks]), cfg256
            )
            toks.append(int(jnp.argmax(logits[0, -1])))
        return toks[len(prompt):]

    prompts = {1: [5, 9, 17, 3]}
    engine = ServingEngine(
        qparams, cfg256, num_pages=32, page_tokens=16, max_batch=2,
        cache_dtype=jnp.float32, chunk_size=16,
    )
    for rid, p in prompts.items():
        engine.submit(GenerationRequest(rid, p, max_new_tokens=4))
    out = engine.run()
    for rid, p in prompts.items():
        expect = _uncached_greedy_q(p, 4)
        assert out[rid] == expect, (rid, out[rid], expect)


def test_int4_cache_decode_matches_dequant():
    """int4 shared-byte paged decode vs dense reference on the dequantized
    cache — exact parity (the kernel consumes the same nibble values the
    dequantizer reads back)."""
    from metal_flash_attention_plus_tpu.serving.kv_cache import (
        _pack_tokens_kv4,
        unpack_kv4,
    )

    b, hq, hkv, d, pt, npages = 2, 4, 2, 64, 64, 8
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    lengths = jnp.asarray([100, 33], jnp.int32)
    max_len = 128
    q = jax.random.normal(ks[0], (b, hq, d), jnp.float32)
    k_full = jax.random.normal(ks[1], (b, hkv, max_len, d), jnp.float32)
    v_full = jax.random.normal(ks[2], (b, hkv, max_len, d), jnp.float32)

    byte, kscale, vscale = _pack_tokens_kv4(k_full, v_full)

    # int4 pool: ONE byte row per token ([Hkv, pages, pt, D]).
    kv_pages = jnp.zeros((hkv, npages + 1, pt, d), jnp.int8)
    ks_pages = jnp.zeros((hkv, npages + 1, 1, pt), jnp.float32)
    vs_pages = jnp.zeros_like(ks_pages)
    table = np.full((b, 2), npages, np.int32)
    phys = iter(range(npages))
    for i in range(b):
        n = -(-int(lengths[i]) // pt)
        ids = [next(phys) for _ in range(n)]
        table[i, :n] = ids
        for j, pid in enumerate(ids):
            lo, hi = j * pt, min((j + 1) * pt, max_len)
            kv_pages = kv_pages.at[:, pid, : hi - lo].set(byte[i, :, lo:hi])
            ks_pages = ks_pages.at[:, pid, 0, : hi - lo].set(
                kscale[i, :, lo:hi, 0]
            )
            vs_pages = vs_pages.at[:, pid, 0, : hi - lo].set(
                vscale[i, :, lo:hi, 0]
            )

    o = paged_decode_attention(
        q, kv_pages, jnp.asarray(table), lengths, page_tokens=pt,
        k_scales=ks_pages, v_scales=vs_pages, kv_bits=4,
    )
    k4, v4 = unpack_kv4(byte)
    kd = k4.astype(jnp.float32) * kscale
    vd = v4.astype(jnp.float32) * vscale
    for i in range(b):
        n = int(lengths[i])
        o_ref, _ = reference_attention(
            q[i][None, :, None, :], kd[i][None, :, :n], vd[i][None, :, :n]
        )
        np.testing.assert_allclose(
            np.asarray(o[i]), np.asarray(o_ref[0, :, 0]), atol=2e-5,
            err_msg=f"seq {i}",
        )


def test_int4_cache_roundtrip_and_capacity():
    """write_prompt/append_tokens into an int4 cache, gather_kv back: error
    bounded by the per-token scale; pool bytes are a QUARTER of bf16's and
    HALF of int8's (the reference's 12.5%-memory claim,
    ``/root/reference/README.md:291-296``)."""
    hkv, d, pt, npages, L = 2, 32, 16, 6, 40
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    k = jax.random.normal(ks[0], (hkv, L, d), jnp.float32)
    v = jax.random.normal(ks[1], (hkv, L, d), jnp.float32)
    cache = PagedKVCache.create(1, hkv, npages, pt, d, quantized=True, bits=4)
    cache16 = PagedKVCache.create(1, hkv, npages, pt, d)
    cache8 = PagedKVCache.create(1, hkv, npages, pt, d, quantized=True)
    assert cache.kv_pages.nbytes * 4 == cache16.kv_pages.nbytes
    assert cache.kv_pages.nbytes * 2 == cache8.kv_pages.nbytes

    page_row = jnp.asarray([0, 1, 2, 3], jnp.int32)
    cache = write_prompt(cache, 0, k, v, page_row)
    # Append one decode token.
    k1 = jax.random.normal(ks[2], (1, hkv, d), jnp.float32)
    v1 = jax.random.normal(ks[3], (1, hkv, d), jnp.float32)
    cache = append_tokens(
        cache, 0, k1, v1, jnp.asarray([L]), page_row[None]
    )
    kg, vg = gather_kv(cache, 0, page_row, L + 1)
    full_k = jnp.concatenate([k, k1.transpose(1, 0, 2)], axis=1)
    full_v = jnp.concatenate([v, v1.transpose(1, 0, 2)], axis=1)
    # Per-token int4 bound: |x - q·s| <= s/2, s = absmax/7.
    bound_k = jnp.max(jnp.abs(full_k), axis=-1, keepdims=True) / 7.0
    bound_v = jnp.max(jnp.abs(full_v), axis=-1, keepdims=True) / 7.0
    assert float(jnp.max(jnp.abs(kg - full_k) - bound_k / 2)) < 1e-5
    assert float(jnp.max(jnp.abs(vg - full_v) - bound_v / 2)) < 1e-5


def test_engine_with_int4_cache():
    """End-to-end generation with the int4 shared-byte cache: int4 KV
    noise (~8% rel) perturbs greedy argmax more than int8 — require the
    majority of tokens to agree with the float-cache engine at this tiny
    scale (and identical output LENGTHS, i.e. no crashes/divergence)."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    params = init_params(CFG, jax.random.PRNGKey(0))
    prompts = {1: [5, 9, 17, 3, 22, 8, 1], 2: [7] * 19}

    outs = {}
    for quant in (False, 4):
        engine = ServingEngine(
            params, CFG, num_pages=32, page_tokens=16, max_batch=2,
            cache_dtype=jnp.float32, quantized_cache=quant,
        )
        for rid, p in prompts.items():
            engine.submit(GenerationRequest(rid, p, max_new_tokens=5))
        outs[quant] = engine.run()

    agree = sum(
        a == b
        for rid in prompts
        for a, b in zip(outs[False][rid], outs[4][rid])
    )
    total = sum(len(outs[False][rid]) for rid in prompts)
    assert all(
        len(outs[4][rid]) == len(outs[False][rid]) for rid in prompts
    ), (outs[False], outs[4])
    assert agree / total >= 0.6, (outs[False], outs[4])


@pytest.mark.slow
def test_engine_preempts_under_mid_stream_pool_exhaustion():
    """Failure injection (SURVEY §5): two sequences whose prompts fill
    the pool exactly, so the FIRST decode token of each needs a page the
    pool doesn't have.  The scheduler must PREEMPT the youngest
    (recompute policy: evict, re-queue, re-prefill prompt+generated) and
    the run must COMPLETE with outputs IDENTICAL to an unconstrained
    pool — KV recompute is exact, so greedy decoding cannot diverge."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    params = init_params(CFG, jax.random.PRNGKey(0))
    outs = {}
    preempted = {}
    for pages in (2, 32):
        engine = ServingEngine(
            params, CFG, num_pages=pages, page_tokens=16, max_batch=2,
            cache_dtype=jnp.float32, chunk_size=16,
        )
        # Each prompt fills exactly one page; decode token 17 needs a
        # second page per sequence.
        engine.submit(
            GenerationRequest(1, list(range(16)), max_new_tokens=8))
        engine.submit(
            GenerationRequest(2, list(range(16)), max_new_tokens=8))
        outs[pages] = engine.run(max_steps=300)
        preempted[pages] = engine.sched.num_preempted
    assert preempted[2] >= 1, "tight pool must have preempted"
    assert preempted[32] == 0
    for rid in (1, 2):
        assert len(outs[2][rid]) == 8
        assert outs[2][rid] == outs[32][rid], (
            rid, outs[2][rid], outs[32][rid]
        )


def test_engine_unschedulable_request_fails_loudly():
    """A single sequence whose prompt+generation exceeds the whole pool
    can never finish: after it is preempted with no progress, admission
    stalls and the engine raises instead of re-prefilling forever."""
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    params = init_params(CFG, jax.random.PRNGKey(0))
    engine = ServingEngine(
        params, CFG, num_pages=2, page_tokens=16, max_batch=2,
        cache_dtype=jnp.float32, chunk_size=16,
    )
    # Pool capacity is 32 tokens; this request needs 16 + 48.
    engine.submit(GenerationRequest(1, list(range(16)), max_new_tokens=48))
    with pytest.raises(RuntimeError, match="cannot be admitted"):
        engine.run(max_steps=200)


def test_engine_fused_decode_matches_single_step():
    # decode_steps > 1 (fused lax.scan decode with in-graph greedy
    # sampling + multi-token scheduler grants) must generate exactly the
    # single-step engine's tokens, report steady-state occupancy, and
    # split phase timings.
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    params = init_params(CFG, jax.random.PRNGKey(0))
    prompts = {1: [5, 9, 17, 3, 22, 8, 1], 2: [100, 42], 3: [7] * 19}

    def run(decode_steps, max_new=9):
        engine = ServingEngine(
            params, CFG, num_pages=32, page_tokens=16, max_batch=2,
            cache_dtype=jnp.float32, decode_steps=decode_steps,
        )
        for rid, p in prompts.items():
            engine.submit(GenerationRequest(rid, p, max_new_tokens=max_new))
        out = engine.run()
        return out, engine

    out1, _ = run(1)
    out4, engine4 = run(4)
    assert out1 == out4, (out1, out4)
    st = engine4.stats
    assert st["decode_tokens"] > 0
    assert 0.0 < st["decode_occupancy"] <= 1.0
    assert st["decode_s"] > 0 and st["prefill_s"] > 0
    # max_new NOT a multiple of decode_steps → tail takes the single-step
    # path; totals still exact.
    out5, _ = run(5, max_new=7)
    outr, _ = run(1, max_new=7)
    assert out5 == outr
