"""Device timing utilities.

The reference times kernels with ``commandBuffer.gpuEndTime - gpuStartTime``
(``SquareAttentionTest.swift:390-394``).  On this environment's axon-tunneled
TPU runtime, ``block_until_ready`` does NOT actually synchronize — the only
reliable fence is a device→host readback.  Because the TPU executes one
program at a time per core, reading back the *last* result of a dispatch
train fences the whole train.  We therefore time N-iteration trains ending
in a scalar readback and use the slope between two train lengths to cancel
the fixed dispatch/readback overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _run_train(f: Callable, args, iters: int) -> float:
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = jnp.asarray(leaf).ravel()[0].item()  # readback fence
    return time.perf_counter() - t0


def measure(
    f: Callable, *args, iters: int = 100, warmup: int = 5, trains: int = 5
) -> float:
    """Min-of-N seconds-per-call over long fenced dispatch trains.

    A long train amortizes the per-call dispatch overhead (~30 µs here) and
    the readback fence; short-train slope estimates proved unstable on this
    runtime.  Min (not median): queue interference only ever ADDS time, and
    cross-run medians still showed ±20% noise — enough to swamp real 5-10%
    kernel deltas (docs/perf_notes.md)."""
    _run_train(f, args, max(1, warmup))
    best = min(_run_train(f, args, iters) / iters for _ in range(trains))
    return max(best, 1e-9)


def tflops(flop_count: float, seconds: float) -> float:
    return flop_count / seconds / 1e12
