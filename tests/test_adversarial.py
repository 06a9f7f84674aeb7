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


def test_mosaic_crash_geometries_guarded():
    # Both known Mosaic-crash geometries must raise an actionable
    # ValueError at trace time instead of an opaque HTTP-500 from
    # tpu_compile_helper (COVERAGE.md known gaps; repro exp34):
    # (a) quantized dequant-on-load forward with an n_inner >= 8 unroll,
    # (b) float "mega-body" forward (n_inner >= 8) at lane-multiple d.
    import jax
    import jax.numpy as jnp
    import pytest

    from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        BlockSizes,
        flash_attention_forward,
    )
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_forward,
    )
    from metal_flash_attention_plus_tpu.quant.params import (
        QuantConfig,
        QuantGranularity,
        QuantStrategy,
    )
    from metal_flash_attention_plus_tpu.quant.tensor import quantize

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, 2, 4096, 128), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 2, 4096, 128), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 4096, 128), jnp.float32)
    mega = BlockSizes(block_q=512, block_kv=512, block_kv_major=4096)
    with pytest.raises(ValueError, match="Mosaic"):
        flash_attention_forward(
            q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            mask=CAUSAL, block_sizes=mega, interpret=False,
        )
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.CENTERED,  # zp != 0 → dequant-on-load path
    )
    with pytest.raises(ValueError, match="Mosaic"):
        quantized_flash_attention_forward(
            q, quantize(k, cfg), quantize(v, cfg),
            mask=CAUSAL, block_sizes=mega, interpret=False,
        )


def test_donated_buffer_aliasing():
    # Buffer-donation contract (VERDICT r4 §5): callers commonly jit entry
    # points with donate_argnums (training loops donate activations); XLA
    # may then alias an INPUT buffer into an output.  The kernels must not
    # depend on input buffers surviving the call — in particular the dbias
    # path's internal input_output_aliases (a zeros operand aliased into
    # the dbias output) must compose with caller-side donation.  On CPU
    # donation is a no-op (XLA ignores it with a warning) so this is a
    # contract/smoke test there; under MFA_TPU_TESTS=1 it exercises real
    # aliasing.
    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np

    from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        flash_attention,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (1, 2, 256, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 256, 64), jnp.float32)
    bias = jax.random.normal(ks[3], (1, 1, 256, 256), jnp.float32)

    def loss(q, k, v, bias):
        return jnp.sum(
            flash_attention(q, k, v, bias=bias, mask=CAUSAL) ** 2
        )

    grads_ref = jax.grad(loss, argnums=(0, 3))(q, k, v, bias)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # CPU: "donation is not implemented"
        donating = jax.jit(
            jax.grad(loss, argnums=(0, 3)), donate_argnums=(0, 3)
        )
        grads_don = donating(q.copy(), k, v, bias.copy())
    for g, g_r in zip(grads_don, grads_ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_r), atol=1e-5
        )
