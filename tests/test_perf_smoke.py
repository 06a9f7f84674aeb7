"""Hardware perf smoke tests + calibration round trip (tpu_only).

The analog of the reference's Tier-3 perf tests (CrossoverBenchmarkTest,
WarmupAwarePerformanceTest, SparseAttentionPerformanceTest — SURVEY.md §4):
loose floors that catch order-of-magnitude regressions, not tight targets
(those live in bench.py + BENCH_r*.json)."""

import jax
import jax.numpy as jnp
import pytest

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.attention.tuning import AttentionTuner, CalibrationStore
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.utils.roofline import attention_flops

pytestmark = pytest.mark.tpu_only


def _tflops(d, h, mask=CAUSAL, s=4096, b=4):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    f = jax.jit(
        lambda q, k, v: flash_attention_forward(
            q, k, v, mask=mask, interpret=False
        )[0]
    )
    sec = measure(f, q, k, v, iters=30, warmup=3)
    return attention_flops(s, s, d, num_heads=h, batch=b) / 2 / sec / 1e12


def test_forward_perf_floor():
    # Loose floors ≈ 60% of round-1 measurements (21.8 / 55.7 TF/s).
    assert _tflops(64, 8) > 13.0
    assert _tflops(256, 4) > 33.0


def test_causal_beats_dense_per_flop_budget():
    """Block skipping must make causal cost ~half of dense wall-clock
    (the whole point of the live-tile schedule)."""
    import time

    from metal_flash_attention_plus_tpu.attention.masking import FULL

    d, h, s, b = 128, 8, 4096, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)

    def run(mask):
        f = jax.jit(
            lambda q, k, v: flash_attention_forward(
                q, k, v, mask=mask, interpret=False
            )[0]
        )
        return measure(f, q, k, v, iters=30, warmup=3)

    t_causal, t_full = run(CAUSAL), run(FULL)
    assert t_causal < 0.75 * t_full, (t_causal, t_full)


def test_calibrate_persists_and_improves(tmp_path):
    """tuner.calibrate measures real dispatches and persists the winner
    (MaskingStrategyHeuristic.calibrate + store round-trip analog)."""
    tuner = AttentionTuner(store=CalibrationStore(cache_dir=str(tmp_path)))
    best = tuner.calibrate(
        64, 2048, num_heads=4, batch=2, iters=10,
        candidates=((256, 512), (512, 512)),
    )
    assert best.block_q in (256, 512)
    # A fresh tuner over the same store must serve the calibrated entry.
    tuner2 = AttentionTuner(store=CalibrationStore(cache_dir=str(tmp_path)))
    assert tuner2.recommend("fwd", 64, 2048) == best

def test_baseline_config2_full_shape():
    """BASELINE config 2 at full shape on hardware: fwd+bwd, causal +
    external bias, GQA 8 KV heads, seq 2K — runs and is finite."""
    b, hq, hkv, s, d = 2, 16, 8, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (1, hq, s, s), jnp.float32) * 0.5
    do = jax.random.normal(ks[4], (b, hq, s, d), jnp.bfloat16)

    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        flash_attention,
    )

    g = jax.jit(
        jax.grad(
            lambda q_, k_, v_, b_: jnp.sum(
                flash_attention(q_, k_, v_, b_, mask=CAUSAL).astype(
                    jnp.float32
                )
                * do.astype(jnp.float32)
            ),
            argnums=(0, 1, 2, 3),
        )
    )
    grads = g(q, k, v, bias)
    for a in grads:
        assert bool(jnp.isfinite(a.astype(jnp.float32)).all())
