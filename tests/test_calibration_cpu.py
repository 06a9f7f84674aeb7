"""Calibration LOGIC on the CPU interpreter (VERDICT r2 weak #6: the
calibrate paths must not be tpu_only-dead in CI).

The measured numbers are meaningless in interpret mode — what these tests
pin is the machinery: candidate sweep over real dispatches, winner
persistence, fresh-tuner round-trip, and the GEMM kind.  Hardware
calibration quality is covered by the tpu_only tier (test_perf_smoke.py).
"""

import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.tuning import (
    AttentionTuner,
    CalibrationStore,
)


def test_calibrate_runs_and_persists_on_cpu(tmp_path):
    tuner = AttentionTuner(store=CalibrationStore(cache_dir=str(tmp_path)))
    best = tuner.calibrate(
        64, 256, num_heads=1, batch=1, iters=1,
        candidates=((128, 128), (256, 256)),
    )
    assert best.block_q in (128, 256)
    # A fresh tuner over the same store serves the calibrated entry.
    tuner2 = AttentionTuner(store=CalibrationStore(cache_dir=str(tmp_path)))
    assert tuner2.recommend("fwd", 64, 256) == best


def test_calibrate_gemm_runs_and_persists_on_cpu(tmp_path):
    tuner = AttentionTuner(store=CalibrationStore(cache_dir=str(tmp_path)))
    blocks = tuner.calibrate_gemm(
        128, 256, 256, mode="dynamic", iters=1,
        candidates=((128, 128, 128), (128, 256, 256)),
    )
    assert blocks in ((128, 128, 128), (128, 256, 256))
    tuner2 = AttentionTuner(store=CalibrationStore(cache_dir=str(tmp_path)))
    assert tuner2.recommend_gemm(128, 256, 256, mode="dynamic") == blocks


def test_calibrate_bwd_kind_on_cpu(tmp_path):
    tuner = AttentionTuner(store=CalibrationStore(cache_dir=str(tmp_path)))
    best = tuner.calibrate(
        64, 256, kind="bwd", num_heads=1, batch=1, iters=1,
        candidates=((128, 128), (256, 256)),
    )
    assert best.block_q_dkv in (128, 256)  # bwd candidates tune *_dkv/_dq
    assert tuner.recommend("bwd", 64, 256) == best
