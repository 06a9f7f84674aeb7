"""Adversarial randomized configurations — the reference's
``AdversarialShapeTest`` (20 random shapes, random per-operand precisions)
translated: random shapes / masks / GQA layouts / dtypes through the fwd
kernel vs the dense golden."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from metal_flash_attention_plus_tpu.attention import masking
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
)

BS = BlockSizes(
    block_q=128, block_kv=128, block_q_dkv=128, block_kv_dkv=128,
    block_q_dq=128, block_kv_dq=128,
)


@pytest.mark.slow
def test_adversarial_random_configs():
    rng = np.random.RandomState(0)
    for trial in range(12):
        b = int(rng.randint(1, 3))
        hkv = int(rng.choice([1, 2, 3]))
        group = int(rng.choice([1, 2, 4]))
        hq = hkv * group
        sq = int(rng.randint(17, 300))
        skv = int(rng.randint(max(17, sq // 2), 400))
        d = int(rng.choice([32, 64, 80, 96]))
        dtype = rng.choice([jnp.float32, jnp.bfloat16])
        interleaved = bool(rng.randint(2))
        kind = rng.choice(["full", "causal", "window", "ranges"])

        mask = masking.FULL
        ranges = None
        if kind == "causal":
            mask = masking.CAUSAL
        elif kind == "window":
            mask = masking.sliding_window(
                int(rng.randint(8, 128)), causal=bool(rng.randint(2))
            )
        elif kind == "ranges":
            mask = masking.MaskSpec(kind=masking.MaskKind.SPARSE_RANGES)
            start = rng.randint(0, skv // 2, size=sq)
            end = start + rng.randint(0, skv // 2, size=sq)
            ranges = np.stack(
                [start, np.minimum(end, skv)], axis=-1
            ).astype(np.int32)

        ks = jax.random.split(jax.random.PRNGKey(trial), 3)
        q = jax.random.normal(ks[0], (b, hq, sq, d), dtype)
        k = jax.random.normal(ks[1], (b, hkv, skv, d), dtype)
        v = jax.random.normal(ks[2], (b, hkv, skv, d), dtype)

        o, l = flash_attention_forward(
            q, k, v, mask=mask, mask_ranges=ranges,
            block_sizes=BS, interleaved_kv=interleaved,
        )
        o_ref, l_ref = reference_attention(
            q, k, v, mask=mask, mask_ranges=ranges,
            interleaved_kv=interleaved,
        )
        tol = 2e-5 if dtype == jnp.float32 else 5e-2
        msg = (
            f"trial {trial}: b={b} hq={hq} hkv={hkv} sq={sq} skv={skv} "
            f"d={d} {np.dtype(dtype).name} {kind} inter={interleaved}"
        )
        # Fully-masked rows are undefined: the kernel zeroes them (L=-inf),
        # the dense golden emits a uniform-softmax artifact.  Compare live
        # rows; assert the kernel's convention on the dead ones.
        live = np.isfinite(np.asarray(l))
        np.testing.assert_allclose(
            np.asarray(o)[live], np.asarray(o_ref)[live], atol=tol,
            err_msg=msg,
        )
        np.testing.assert_allclose(
            np.asarray(o)[~live], 0.0, atol=0, err_msg=msg
        )
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            compute_row_ranges,
        )

        rr = compute_row_ranges(mask, sq, skv, mask_ranges=ranges)
        expect_live = rr[:, 1] > rr[:, 0]
        np.testing.assert_array_equal(
            live[0, 0], expect_live, err_msg=msg
        )
        np.testing.assert_allclose(
            np.asarray(l)[live], np.asarray(l_ref)[live], atol=7e-3,
            err_msg=msg,
        )
