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


def measure_chained(
    f: Callable,
    *args,
    chain: int = 8,
    iters: int = 4,
    warmup: int = 1,
    trains: int = 3,
    eps: float = 1e-30,
) -> float:
    """Seconds per *kernel invocation* with dispatches CHAINED inside one jit.

    On this axon-tunneled runtime each jit dispatch costs ~0.45-0.95 ms of
    unpipelined round-trip (measured: a trivial ``x+1`` jit call is 446 µs;
    a d256 flash call fits t = 923 µs + 6.0 µs/grid-step) — dispatch trains
    do NOT amortize it because executes serialize through the tunnel.  The
    reference benchmarks the same way: it duplicates dispatches inside one
    command buffer (``QuantizedAttention.swift:878-989``), timing device
    rate rather than host round-trips.

    Each link feeds a 1-element perturbation of the first argument from the
    previous output (defeats CSE, forces ordering; eps=1e-30 leaves values
    numerically intact).  Per-kernel seconds = call time / chain, minus the
    residual dispatch share (amortized ``chain``-fold, not subtracted).
    """
    first = args[0]
    idx = (0,) * first.ndim

    def chained(*a):
        x = a[0]
        out = None
        for _ in range(chain):
            out = f(x, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = leaf.ravel()[0].astype(x.dtype) * jnp.asarray(
                eps, x.dtype
            )
            x = x.at[idx].add(s)
        return out

    g = jax.jit(chained)
    _run_train(g, args, max(1, warmup))
    best = min(_run_train(g, args, iters) / iters for _ in range(trains))
    return max(best / chain, 1e-9)


def tflops(flop_count: float, seconds: float) -> float:
    return flop_count / seconds / 1e12
