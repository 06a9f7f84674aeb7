"""Backward kernels (dQ + dK/dV) vs autodiff-through-golden (tier 1).

The parity ladder follows ``KernelRegressionTests`` (causal with both
masking styles, rectangular, GQA broadcast) — SURVEY.md §4/§7 step 3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention import masking
from metal_flash_attention_plus_tpu.attention.masking import MaskKind, MaskSpec
from metal_flash_attention_plus_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_plus_tpu.reference import reference_attention
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention_vjp,
)
from metal_flash_attention_plus_tpu.utils.testing import (
    assert_close,
    random_qkv,
)

GRAD_TOL = 3e-4  # fp32 cross-derivation tolerance (golden vjp itself has ~1e-4 noise)


def grads_of(q, k, v, do, **kw):
    def f(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, **kw) * do)

    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize(
    "mask",
    [masking.FULL, masking.CAUSAL, masking.sliding_window(64, causal=True)],
    ids=["full", "causal", "window"],
)
def test_backward_fp32(mask):
    q, k, v = random_qkv(jax.random.key(0), 1, 2, 2, 256, 256, 64)
    do = jax.random.normal(jax.random.key(1), q.shape)
    dq, dk, dv = grads_of(q, k, v, do, mask=mask)
    dq_r, dk_r, dv_r = reference_attention_vjp(q, k, v, do, mask=mask)
    assert_close(dq, dq_r, GRAD_TOL, "dq")
    assert_close(dk, dk_r, GRAD_TOL, "dk")
    assert_close(dv, dv_r, GRAD_TOL, "dv")


@pytest.mark.parametrize("hq,hkv", [(4, 2), (4, 1)], ids=["gqa", "mqa"])
@pytest.mark.parametrize("interleaved", [False, True])
def test_backward_gqa_reduction(hq, hkv, interleaved):
    q, k, v = random_qkv(jax.random.key(2), 1, hq, hkv, 128, 128, 32)
    do = jax.random.normal(jax.random.key(3), q.shape)
    dq, dk, dv = grads_of(
        q, k, v, do, mask=masking.CAUSAL, interleaved_kv=interleaved
    )
    dq_r, dk_r, dv_r = reference_attention_vjp(
        q, k, v, do, mask=masking.CAUSAL, interleaved_kv=interleaved
    )
    assert dk.shape == k.shape and dv.shape == v.shape
    assert_close(dq, dq_r, GRAD_TOL, "dq")
    assert_close(dk, dk_r, GRAD_TOL, "dk")
    assert_close(dv, dv_r, GRAD_TOL, "dv")


def test_backward_rectangular_odd():
    q, k, v = random_qkv(jax.random.key(4), 1, 2, 2, 200, 333, 64)
    do = jax.random.normal(jax.random.key(5), q.shape)
    dq, dk, dv = grads_of(q, k, v, do, mask=masking.CAUSAL)
    dq_r, dk_r, dv_r = reference_attention_vjp(q, k, v, do, mask=masking.CAUSAL)
    assert_close(dq, dq_r, GRAD_TOL, "dq")
    assert_close(dk, dk_r, GRAD_TOL, "dk")
    assert_close(dv, dv_r, GRAD_TOL, "dv")


def test_backward_bias_gradient():
    q, k, v = random_qkv(jax.random.key(6), 1, 2, 2, 128, 128, 32)
    bias = jax.random.normal(jax.random.key(7), (1, 2, 128, 128))
    do = jax.random.normal(jax.random.key(8), q.shape)

    def f(q_, k_, v_, b_):
        return jnp.sum(flash_attention(q_, k_, v_, b_) * do)

    def fr(q_, k_, v_, b_):
        return jnp.sum(reference_attention(q_, k_, v_, bias=b_)[0] * do)

    g = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(fr, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g, gr, ["dq", "dk", "dv", "dbias"]):
        assert_close(a, b, GRAD_TOL, name)


def test_backward_sparse_ranges():
    sq = 256
    ranges = masking.build_sliding_window_ranges(sq, 48)
    spec = MaskSpec(kind=MaskKind.SPARSE_RANGES)
    q, k, v = random_qkv(jax.random.key(9), 1, 2, 2, sq, sq, 64)
    do = jax.random.normal(jax.random.key(10), q.shape)

    def f(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, mask_ranges=jnp.asarray(ranges), mask=spec)
            * do
        )

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = reference_attention_vjp(
        q, k, v, do, mask=spec, mask_ranges=jnp.asarray(ranges)
    )
    assert_close(dq, dq_r, GRAD_TOL, "dq")
    assert_close(dk, dk_r, GRAD_TOL, "dk")
    assert_close(dv, dv_r, GRAD_TOL, "dv")


def test_backward_bf16_tolerance():
    q, k, v = random_qkv(
        jax.random.key(11), 1, 4, 2, 256, 256, 64, dtype=jnp.bfloat16
    )
    do = jax.random.normal(jax.random.key(12), q.shape, dtype=jnp.bfloat16)

    def f(q_, k_, v_):
        return jnp.sum(
            (flash_attention(q_, k_, v_, mask=masking.CAUSAL) * do).astype(
                jnp.float32
            )
        )

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = reference_attention_vjp(
        q, k, v, do.astype(jnp.float32), mask=masking.CAUSAL
    )
    # mixed-precision gate 5e-2 (AttentionDescriptor+Precisions.swift:29-44)
    assert_close(dq, dq_r, 5e-2, "dq")
    assert_close(dk, dk_r, 5e-2, "dk")
    assert_close(dv, dv_r, 5e-2, "dv")


def test_value_and_grad_jits():
    q, k, v = random_qkv(jax.random.key(13), 1, 1, 1, 128, 128, 32)

    @jax.jit
    def step(q_, k_, v_):
        return jax.value_and_grad(
            lambda a: jnp.sum(flash_attention(a, k_, v_, mask=masking.CAUSAL))
        )(q_)

    val, g = step(q, k, v)
    assert np.isfinite(float(val)) and bool(jnp.isfinite(g).all())


def test_baseline_config2_composition():
    """BASELINE.json config 2 (reduced shapes for CPU): fwd+bwd with causal
    + external bias, GQA with 8→4-style grouping, one composed call."""
    from metal_flash_attention_plus_tpu.attention.masking import CAUSAL

    b, hq, hkv, s, d = 1, 8, 4, 256, 64
    ks = jax.random.split(jax.random.key(31), 5)
    q = jax.random.normal(ks[0], (b, hq, s, d))
    k = jax.random.normal(ks[1], (b, hkv, s, d))
    v = jax.random.normal(ks[2], (b, hkv, s, d))
    bias = jax.random.normal(ks[3], (1, hq, s, s)) * 0.5
    do = jax.random.normal(ks[4], (b, hq, s, d))

    f = lambda q_, k_, v_, b_: jnp.sum(
        flash_attention(q_, k_, v_, b_, mask=CAUSAL) * do
    )
    fr = lambda q_, k_, v_, b_: jnp.sum(
        reference_attention(q_, k_, v_, mask=CAUSAL, bias=b_)[0] * do
    )
    g = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    gr = jax.grad(fr, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, r, name in zip(g, gr, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, err_msg=name
        )


def test_odd_blockcount_packed_bias_grads():
    """ni=3 (odd) leaves one UNPAIRED packed-schedule row; its padding
    steps must not disturb already-written dbias tiles (segment gate on
    t > n0) — regression for the packed-pair schedule."""
    import jax

    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    s = 384
    bs = BlockSizes(
        block_q=128, block_kv=128, block_q_dq=128, block_kv_dq=128,
        block_q_dkv=128, block_kv_dkv=128,
    )
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    q = jax.random.normal(ks[0], (1, 2, s, 64))
    k = jax.random.normal(ks[1], (1, 2, s, 64))
    v = jax.random.normal(ks[2], (1, 2, s, 64))
    bias = jax.random.normal(ks[3], (1, 1, s, s))
    do = jax.random.normal(ks[4], (1, 2, s, 64))

    f = lambda q, bias: jnp.vdot(
        flash_attention(q, k, v, bias, mask=masking.CAUSAL, block_sizes=bs), do
    )
    fr = lambda q, bias: jnp.vdot(
        reference_attention(q, k, v, mask=masking.CAUSAL, bias=bias)[0], do
    )
    dq, db = jax.grad(f, argnums=(0, 1))(q, bias)
    dqr, dbr = jax.grad(fr, argnums=(0, 1))(q, bias)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dqr), atol=5e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dbr), atol=5e-5)


def test_two_level_structure_interpret(monkeypatch):
    """Force the two-level (n_inner > 1) fwd/bwd code paths under the
    interpreter (normally capped to single-level there) and pin against
    the golden vjp — structure coverage for what only TPU runs exercise."""
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        BlockSizes,
    )

    monkeypatch.setenv("MFA_INTERPRET_TWO_LEVEL", "1")
    bs = BlockSizes(
        block_q=128, block_kv=128, block_kv_major=256,
        block_q_dkv=128, block_kv_dkv=128,
        block_q_dq=128, block_kv_dq=128,
        block_kv_dq_major=256, block_q_dkv_major=256,
    )
    q, k, v = random_qkv(jax.random.key(3), 1, 2, 2, 384, 384, 64)
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)
    dq, dk, dv = grads_of(
        q, k, v, do, mask=masking.CAUSAL, block_sizes=bs
    )
    dq_r, dk_r, dv_r = reference_attention_vjp(
        q, k, v, do, mask=masking.CAUSAL
    )
    assert_close(dq, dq_r, GRAD_TOL)
    assert_close(dk, dk_r, GRAD_TOL)
    assert_close(dv, dv_r, GRAD_TOL)
