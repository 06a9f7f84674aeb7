"""Golden-model self-consistency tests (tier 1 backbone, SURVEY.md §4).

The analytic backward (``reference_attention_bwd``) is cross-checked against
jax.vjp through the dense forward — two independent derivations, the analog
of the reference having both ``Network.swift`` and ``referenceAttention``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention import masking
from metal_flash_attention_plus_tpu.attention.masking import MaskKind, MaskSpec
from metal_flash_attention_plus_tpu.reference import (
    reference_attention,
    reference_attention_bwd,
)
from metal_flash_attention_plus_tpu.reference.attention import reference_attention_vjp
from metal_flash_attention_plus_tpu.utils.testing import (
    TOL_FP32,
    assert_close,
    random_qkv,
)


@pytest.mark.parametrize(
    "mask",
    [
        masking.FULL,
        masking.CAUSAL,
        masking.sliding_window(64),
        masking.sliding_window(64, causal=True),
    ],
    ids=["full", "causal", "window", "causal_window"],
)
def test_analytic_backward_matches_autodiff(mask):
    key = jax.random.key(0)
    q, k, v = random_qkv(key, 2, 3, 3, 96, 96, 32)
    do = jax.random.normal(jax.random.key(1), q.shape)

    o, l = reference_attention(q, k, v, mask=mask)
    dq, dk, dv, d = reference_attention_bwd(q, k, v, o, l, do, mask=mask)
    dq2, dk2, dv2 = reference_attention_vjp(q, k, v, do, mask=mask)

    assert_close(dq, dq2, 5e-4, "dq")
    assert_close(dk, dk2, 5e-4, "dk")
    assert_close(dv, dv2, 5e-4, "dv")
    # D = rowsum(dO * O) by definition
    assert_close(d, jnp.sum(do * o, axis=-1), TOL_FP32, "D")


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2), (6, 1)], ids=["mha", "gqa", "mqa"])
@pytest.mark.parametrize("interleaved", [False, True])
def test_gqa_broadcast_backward(hq, hkv, interleaved):
    key = jax.random.key(2)
    q, k, v = random_qkv(key, 1, hq, hkv, 64, 64, 16)
    do = jax.random.normal(jax.random.key(3), q.shape)
    o, l = reference_attention(q, k, v, interleaved_kv=interleaved)
    dq, dk, dv, _ = reference_attention_bwd(
        q, k, v, o, l, do, interleaved_kv=interleaved
    )
    dq2, dk2, dv2 = reference_attention_vjp(q, k, v, do, interleaved_kv=interleaved)
    assert_close(dq, dq2, 5e-4, "dq")
    assert_close(dk, dk2, 5e-4, "dk")
    assert_close(dv, dv2, 5e-4, "dv")
    assert dk.shape == k.shape and dv.shape == v.shape


def test_logsumexp_definition():
    key = jax.random.key(4)
    q, k, v = random_qkv(key, 1, 1, 1, 32, 32, 8)
    o, l = reference_attention(q, k, v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision="highest") * (8.0**-0.5)
    l_direct = jax.nn.logsumexp(s, axis=-1)
    assert_close(l, l_direct, 1e-4, "L")


def test_softmax_rows_sum_to_one_via_l():
    key = jax.random.key(5)
    q, k, v = random_qkv(key, 1, 2, 2, 48, 48, 16)
    o, l = reference_attention(q, k, v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision="highest") * (16.0**-0.5)
    p = jnp.exp(s - l[..., None])
    assert_close(jnp.sum(p, axis=-1), jnp.ones_like(l), 1e-4, "sum P")


def test_external_bias_mask():
    key = jax.random.key(6)
    q, k, v = random_qkv(key, 1, 2, 2, 32, 32, 16)
    bias = jax.random.normal(jax.random.key(7), (1, 2, 32, 32))
    do = jax.random.normal(jax.random.key(8), q.shape)
    o, l = reference_attention(q, k, v, bias=bias)
    dq, dk, dv, _ = reference_attention_bwd(q, k, v, o, l, do, bias=bias)
    dq2, dk2, dv2 = reference_attention_vjp(q, k, v, do, bias=bias)
    assert_close(dq, dq2, 5e-4, "dq")
    assert_close(dk, dk2, 5e-4, "dk")


def test_sliding_window_ranges_parity():
    # Parity with SparseMQABuilder.buildSlidingWindow semantics.
    r = masking.build_sliding_window_ranges(8, 4)
    assert r.shape == (8, 2)
    np.testing.assert_array_equal(r[0], [0, 2])
    np.testing.assert_array_equal(r[4], [2, 6])
    np.testing.assert_array_equal(r[7], [5, 8])


def test_block_sparse_ranges_parity():
    pattern = np.array([[False, True, True, False], [False, False, False, False]])
    r = masking.build_block_sparse_ranges(pattern, 16)
    np.testing.assert_array_equal(r[0], [16, 48])
    np.testing.assert_array_equal(r[1], [0, 0])


def test_sparse_ranges_mask():
    ranges = masking.build_sliding_window_ranges(32, 8)
    spec = MaskSpec(kind=MaskKind.SPARSE_RANGES)
    dense = masking.materialize_mask(spec, 32, 32, ranges=ranges)
    window = masking.materialize_mask(masking.sliding_window(8), 32, 32)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(window))


def test_rectangular_causal_alignment():
    # Decode convention: ends aligned.
    m = masking.materialize_mask(masking.CAUSAL, 2, 6)
    expected = np.array(
        [[1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 1, 1]], dtype=bool
    )
    np.testing.assert_array_equal(np.asarray(m), expected)
