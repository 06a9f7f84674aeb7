"""Flash-attention forward kernel vs golden model (tier 1, SURVEY.md §4).

Runs in Pallas interpreter mode on CPU (default); on TPU with
``MFA_TPU_TESTS=1`` the same cases compile through Mosaic.  Tolerances are
the reference ladder: FP32 2e-5, mixed 5e-2 (``SquareAttentionTest.swift``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention import masking
from metal_flash_attention_plus_tpu.attention.masking import MaskKind, MaskSpec
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    build_block_bounds,
    compute_row_ranges,
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.reference import reference_attention
from metal_flash_attention_plus_tpu.utils.testing import (
    TOL_FP32,
    TOL_MIXED,
    assert_close,
    random_qkv,
)


def run_case(shape, mask, dtype=jnp.float32, tol=None, **kw):
    b, hq, hkv, sq, skv, d = shape
    q, k, v = random_qkv(jax.random.key(0), b, hq, hkv, sq, skv, d, dtype=dtype)
    o_ref, l_ref = reference_attention(q, k, v, mask=mask, **kw)
    o, l = flash_attention_forward(q, k, v, mask=mask, **kw)
    tol = tol or (TOL_FP32 if dtype == jnp.float32 else TOL_MIXED)
    assert_close(o, o_ref, tol, "O")
    assert_close(l, l_ref, max(tol, 1e-4), "L")


@pytest.mark.parametrize(
    "mask",
    [masking.FULL, masking.CAUSAL, masking.sliding_window(64, causal=True)],
    ids=["full", "causal", "window"],
)
def test_fp32_square(mask):
    run_case((1, 2, 2, 256, 256, 64), mask, tol=1e-5)


def test_bf16_gqa():
    run_case((2, 8, 2, 256, 256, 64), masking.CAUSAL, dtype=jnp.bfloat16)


def test_mqa_interleaved():
    run_case(
        (1, 4, 1, 128, 128, 32), masking.CAUSAL, interleaved_kv=True, tol=1e-5
    )


def test_rectangular_cross():
    # Decode-style: short Q against long KV, ends aligned (cross-attention
    # shape zoo from RectangularAttentionTest).
    run_case((1, 2, 2, 128, 384, 64), masking.CAUSAL, tol=1e-5)


def test_odd_shapes():
    # Analog of the reference's odd problem sizes (seq 777, D 199 —
    # SquareAttentionTest.swift:5-26): non-multiple-of-block seq.
    run_case((1, 1, 1, 200, 333, 64), masking.CAUSAL, tol=1e-5)


def test_external_bias():
    b, hq, sq, d = 1, 2, 128, 64
    q, k, v = random_qkv(jax.random.key(3), b, hq, hq, sq, sq, d)
    bias = jax.random.normal(jax.random.key(4), (1, hq, sq, sq))
    o_ref, l_ref = reference_attention(q, k, v, bias=bias)
    o, l = flash_attention_forward(q, k, v, bias=bias)
    assert_close(o, o_ref, 1e-5, "O")
    assert_close(l, l_ref, 1e-4, "L")


def test_sparse_ranges():
    sq = 256
    ranges = masking.build_sliding_window_ranges(sq, 48)
    spec = MaskSpec(kind=MaskKind.SPARSE_RANGES)
    q, k, v = random_qkv(jax.random.key(5), 1, 2, 2, sq, sq, 64)
    o_ref, l_ref = reference_attention(q, k, v, mask=spec, mask_ranges=ranges)
    o, l = flash_attention_forward(q, k, v, mask=spec, mask_ranges=ranges)
    assert_close(o, o_ref, 1e-5, "O")


def test_block_sparse():
    sq, bs = 256, 64
    pattern = np.zeros((sq // bs, sq // bs), dtype=bool)
    for i in range(sq // bs):
        pattern[i, max(0, i - 1) : i + 1] = True  # banded blocks
    ranges = masking.build_block_sparse_ranges(pattern, bs)
    spec = MaskSpec(kind=MaskKind.BLOCK_SPARSE, block_size=bs)
    q, k, v = random_qkv(jax.random.key(6), 1, 1, 1, sq, sq, 64)
    o_ref, l_ref = reference_attention(q, k, v, mask=spec, mask_ranges=ranges)
    o, l = flash_attention_forward(q, k, v, mask=spec, mask_ranges=ranges)
    assert_close(o, o_ref, 1e-5, "O")


def test_empty_range_rows_zeroed():
    sq = 128
    ranges = np.zeros((sq, 2), dtype=np.int32)
    ranges[: sq // 2, 1] = 64  # first half attends [0,64); second half empty
    spec = MaskSpec(kind=MaskKind.SPARSE_RANGES)
    q, k, v = random_qkv(jax.random.key(7), 1, 1, 1, sq, sq, 32)
    o, l = flash_attention_forward(q, k, v, mask=spec, mask_ranges=ranges)
    np.testing.assert_array_equal(np.asarray(o[0, 0, sq // 2 :]), 0.0)
    assert bool(jnp.all(jnp.isneginf(l[0, 0, sq // 2 :])))


def test_custom_softmax_scale():
    run_case((1, 1, 1, 128, 128, 64), masking.FULL, scale=0.35, tol=1e-5)


def test_block_bounds_causal():
    rr = compute_row_ranges(masking.CAUSAL, 4096, 4096)
    lo, hi, ms, me = build_block_bounds(rr, 512, 1024)
    assert (lo == 0).all()
    # q-block i's widest row sees (i+1)*512 kv columns.
    np.testing.assert_array_equal(
        hi, [-(-((i + 1) * 512) // 1024) for i in range(8)]
    )
    # Live tile count drives the cost estimate.
    assert int((hi - lo).sum()) == sum(
        -(-((i + 1) * 512) // 1024) for i in range(8)
    )


def test_block_bounds_empty_rows():
    rr = np.zeros((256, 2), dtype=np.int32)  # everything masked
    lo, hi, ms, me = build_block_bounds(rr, 128, 128)
    assert (hi == lo).all()  # zero-width windows → store-zero path


def test_wavefront_parts_cover_and_balance():
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        plan_wavefront_parts,
    )

    runs = np.arange(1, 9)  # causal
    parts = plan_wavefront_parts(runs)
    assert parts[0][0] == 0 and parts[-1][1] == 8
    assert all(a < b for a, b in parts)
    assert all(parts[k][1] == parts[k + 1][0] for k in range(len(parts) - 1))
    # Uniform runs: single dispatch.
    assert plan_wavefront_parts(np.full(8, 4)) == [(0, 8)]


def test_block_size_validation():
    with pytest.raises(ValueError):
        BlockSizes(block_q=100)


@pytest.mark.parametrize(
    "mask",
    [masking.FULL, masking.CAUSAL, masking.sliding_window(128)],
    ids=["full", "causal", "window"],
)
def test_static_max_parity(mask):
    # row_max="estimate" replaces the running max with a host-estimated
    # per-row subtrahend; softmax shift-invariance makes the result match
    # the running-max kernel to roundoff (measured neutral-to-negative on
    # v5e — opt-in only, docs/perf_notes.md "static-max").
    b, hq, hkv, sq, skv, d = 2, 4, 2, 256, 320, 64
    q, k, v = random_qkv(jax.random.key(3), b, hq, hkv, sq, skv, d)
    o0, l0 = flash_attention_forward(q, k, v, mask=mask)
    o1, l1 = flash_attention_forward(q, k, v, mask=mask, row_max="estimate")
    assert_close(o1, o0, 1e-5, "O")
    assert_close(l1, l0, 1e-3, "L")


def test_static_max_caller_array():
    # Caller-provided per-row bound in natural units; deliberately loose
    # (true max + 5) to exercise the slack path.
    b, hq, hkv, sq, skv, d = 1, 2, 2, 256, 256, 64
    q, k, v = random_qkv(jax.random.key(4), b, hq, hkv, sq, skv, d)
    s = jnp.einsum(
        "bhrd,bhcd->bhrc", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / jnp.sqrt(jnp.float32(d))
    rm = jnp.max(s, axis=-1) + 5.0
    o0, l0 = flash_attention_forward(q, k, v, mask=masking.CAUSAL)
    o1, l1 = flash_attention_forward(
        q, k, v, mask=masking.CAUSAL, row_max=rm
    )
    assert_close(o1, o0, 1e-5, "O")
    assert_close(l1, l0, 1e-3, "L")
