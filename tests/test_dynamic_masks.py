"""Dynamic (traced) sparse ranges: document/segment masks built INSIDE jit.

The reference builds its range buffers at runtime per dispatch
(``SparseMQABuilder.swift``); here traced ``mask_ranges`` feed the kernels'
scalar-prefetch bounds over a full-width grid, so per-batch packing
layouts don't recompile.  Golden: dense reference attention on the
materialized boolean mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention.masking import (
    CAUSAL,
    MaskKind,
    MaskSpec,
    build_segment_ranges,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention,
    flash_attention_forward,
)

SPARSE = MaskSpec(kind=MaskKind.SPARSE_RANGES)
BS = BlockSizes(
    block_q=128, block_kv=128, block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)


def _segments(s, boundaries):
    seg = np.zeros(s, np.int32)
    for b in boundaries:
        seg[b:] += 1
    return seg


def _dense_golden(q, k, v, ranges, do=None):
    s = q.shape[2]
    cols = jnp.arange(s)[None, :]
    keep = (cols >= ranges[:, 0][:, None]) & (cols < ranges[:, 1][:, None])
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, precision="highest"
    ) * scale
    logits = jnp.where(keep[None, None], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, precision="highest")


def test_segment_ranges_builder():
    seg = _segments(16, [5, 11])
    r = build_segment_ranges(seg, causal=False)
    assert r.tolist()[0] == [0, 5]
    assert r.tolist()[4] == [0, 5]
    assert r.tolist()[5] == [5, 11]
    assert r.tolist()[10] == [5, 11]
    assert r.tolist()[15] == [11, 16]
    rc = build_segment_ranges(seg, causal=True)
    assert rc.tolist()[7] == [5, 8]
    # jnp input → jnp output with identical values
    rj = build_segment_ranges(jnp.asarray(seg), causal=False)
    np.testing.assert_array_equal(np.asarray(rj), r)


def test_dynamic_segment_mask_forward_under_jit():
    s = 256
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, 2, s, 64))
    k = jax.random.normal(ks[1], (1, 2, s, 64))
    v = jax.random.normal(ks[2], (1, 2, s, 64))

    @jax.jit
    def f(q, k, v, seg):
        ranges = build_segment_ranges(seg, causal=True)
        return flash_attention_forward(
            q, k, v, mask=SPARSE, mask_ranges=ranges, block_sizes=BS
        )[0]

    # Two different packings — SAME compiled program (traced ranges).
    for bounds in ([40, 100, 201], [128]):
        seg = jnp.asarray(_segments(s, bounds))
        o = f(q, k, v, seg)
        r_host = build_segment_ranges(_segments(s, bounds), causal=True)
        o_ref = _dense_golden(q, k, v, jnp.asarray(r_host))
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(o_ref), atol=2e-5
        )
    assert f._cache_size() == 1


def test_dynamic_ranges_grads():
    s = 256
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (1, 2, s, 64))
    k = jax.random.normal(ks[1], (1, 2, s, 64))
    v = jax.random.normal(ks[2], (1, 2, s, 64))
    do = jax.random.normal(ks[3], (1, 2, s, 64))
    seg = jnp.asarray(_segments(s, [70, 190]))

    def f(q, k, v):
        ranges = build_segment_ranges(seg, causal=False)
        return jnp.vdot(
            flash_attention(
                q, k, v, mask_ranges=ranges, mask=SPARSE, block_sizes=BS
            ),
            do,
        )

    def fr(q, k, v):
        ranges = build_segment_ranges(seg, causal=False)
        return jnp.vdot(_dense_golden(q, k, v, ranges), do)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_dynamic_requires_sparse_kind():
    s = 128
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 1, s, 64))
    k = jax.random.normal(ks[1], (1, 1, s, 64))
    v = jax.random.normal(ks[2], (1, 1, s, 64))
    ranges = jnp.stack(
        [jnp.zeros(s, jnp.int32), jnp.arange(1, s + 1, dtype=jnp.int32)], -1
    )
    with pytest.raises(ValueError, match="SPARSE_RANGES"):
        flash_attention_forward(
            q, k, v, mask=CAUSAL, mask_ranges=ranges, block_sizes=BS
        )


def test_dynamic_ranges_quantized_kv():
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_forward,
    )
    from metal_flash_attention_plus_tpu.quant.params import (
        QuantConfig,
        QuantGranularity,
        QuantStrategy,
    )
    from metal_flash_attention_plus_tpu.quant.tensor import quantize

    s = 256
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (1, 2, s, 64))
    k = jax.random.normal(ks[1], (1, 2, s, 64))
    v = jax.random.normal(ks[2], (1, 2, s, 64))
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.CENTERED,
    )
    kq, vq = quantize(k, cfg), quantize(v, cfg)

    @jax.jit
    def f(q, seg):
        ranges = build_segment_ranges(seg, causal=True)
        return quantized_flash_attention_forward(
            q, kq, vq, mask=SPARSE, mask_ranges=ranges, block_sizes=BS
        )[0]

    seg = jnp.asarray(_segments(s, [90, 170]))
    o = f(q, seg)
    r_host = build_segment_ranges(_segments(s, [90, 170]), causal=True)
    o_ref = _dense_golden(
        q, kq.dequantize(), vq.dequantize(), jnp.asarray(r_host)
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)
