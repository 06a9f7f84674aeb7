"""Test utilities: tolerance ladder + deterministic data generators.

Tolerance parity with the reference (``SquareAttentionTest.swift:558-571``,
``QuantizedAttentionTest.swift:519-520``):
  FP32 pipeline      max abs err 2e-5   (O, L, D, dQ, dK, dV)
  mixed bf16         max abs err 5e-2   (O/dV/dK/dQ), L 7e-3, D 1e-1
  quantized          relative err: FP16 < 0.05, INT8 < 0.25
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TOL_FP32 = 2e-5
TOL_MIXED = 5e-2
TOL_MIXED_L = 7e-3
TOL_MIXED_D = 1e-1
RELTOL_FP16 = 0.05
RELTOL_INT8 = 0.25


def random_qkv(key, batch, num_q_heads, num_kv_heads, seq_q, seq_kv, head_dim,
               dtype=jnp.float32):
    """Gaussian Q/K/V like the reference's Box–Muller inputs
    (``Network.swift``); scaled down so softmax is well-conditioned."""
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, num_q_heads, seq_q, head_dim), dtype=jnp.float32)
    k = jax.random.normal(kk, (batch, num_kv_heads, seq_kv, head_dim), dtype=jnp.float32)
    v = jax.random.normal(kv, (batch, num_kv_heads, seq_kv, head_dim), dtype=jnp.float32)
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


def max_abs_err(a, b) -> float:
    return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32))))


def rel_err(a, b) -> float:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.linalg.norm((a - b).ravel()) / (jnp.linalg.norm(b.ravel()) + 1e-12))


def assert_close(actual, expected, tol, what=""):
    err = max_abs_err(actual, expected)
    assert err <= tol, f"{what}: max abs err {err:.3e} > {tol:.1e}"


def assert_rel_close(actual, expected, tol, what=""):
    err = rel_err(actual, expected)
    assert err <= tol, f"{what}: rel err {err:.3e} > {tol:.2f}"


def lcg_data(shape, seed=42, lo=-1.0, hi=1.0):
    """Deterministic LCG data, analog of the reference's deterministic
    generator (``KernelRegressionTests.swift:41-50``)."""
    n = int(np.prod(shape))
    state = np.uint64(seed)
    out = np.empty(n, dtype=np.float64)
    a = np.uint64(6364136223846793005)
    c = np.uint64(1442695040888963407)
    for i in range(n):
        state = a * state + c
        out[i] = (state >> np.uint64(33)) / float(1 << 31)
    return (lo + (hi - lo) * out).reshape(shape).astype(np.float32)
