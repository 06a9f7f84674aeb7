"""Pure-jnp golden attention — analog of the reference's CPU golden models.

The reference validates every GPU kernel against two independent scalar CPU
implementations: ``Tests/.../Utilities/Network.swift`` (S/P/L/D materialized
row-by-row, analytic dQ/dK/dV via the loss Φ = Σ dO⊙O) and
``KernelRegressionTests.referenceAttention`` (BHSD).  This module is the
TPU build's single golden model (SURVEY.md §4, §7 step 1): a dense, fp32,
numerically-transparent implementation that every Pallas kernel is tested
against, in interpreter mode and on device.

Conventions:
- Tensors are BHSD: ``q [B, H, Sq, D]``, ``k/v [B, Hkv, Skv, D]``.
- ``l`` is the *natural-log* row logsumexp ``m + log(sum(exp(s - m)))``,
  shape ``[B, H, Sq]``.  (The reference stores L in log2 space and divides by
  log2(e) before comparison — ``SquareAttentionTest.swift:421-429``; we store
  natural log directly, one canonical convention.)
- ``d = rowsum(dO ⊙ O)``, shape ``[B, H, Sq]`` — the backward intermediate
  the reference calls D (``README.md:140-189``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import (
    DEFAULT_MASK_VALUE,
    MaskSpec,
    FULL,
    materialize_mask,
)


def _expand_kv_heads(
    t: jnp.ndarray, num_q_heads: int, interleaved: bool
) -> jnp.ndarray:
    """Broadcast [B, Hkv, S, D] KV to [B, Hq, S, D] per GQA/MQA mapping."""
    b, hkv, s, d = t.shape
    if hkv == num_q_heads:
        return t
    group = num_q_heads // hkv
    if interleaved:
        # q head h -> kv head h % hkv  (AttentionKernel+Source.swift:84-87)
        return jnp.tile(t, (1, group, 1, 1))
    # q head h -> kv head h // group (grouped/contiguous)
    return jnp.repeat(t, group, axis=1)


@partial(
    jax.jit,
    static_argnames=("scale", "mask", "interleaved_kv", "mask_value"),
)
def reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    mask: MaskSpec = FULL,
    mask_ranges: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    interleaved_kv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense golden attention forward.

    Args:
      q: [B, Hq, Sq, D].
      k, v: [B, Hkv, Skv, D]; Hkv may divide Hq (GQA) or be 1 (MQA).
      scale: softmax scale; default 1/sqrt(D).
      mask: static mask spec.
      mask_ranges: [Sq, 2] (or [num_row_blocks, 2] for BLOCK_SPARSE) int32
        ranges for range-based masks.
      bias: optional additive bias broadcastable to [B, Hq, Sq, Skv] —
        the reference's external mask buffer
        (``AttentionKernel+Softmax.swift:306-335``).
      interleaved_kv: use the reference's ``h % num_kv_heads`` broadcast.

    Returns:
      (o, l): o [B, Hq, Sq, D] fp32; l [B, Hq, Sq] natural logsumexp fp32.
    """
    b, hq, sq, dd = q.shape
    if scale is None:
        scale = float(dd) ** -0.5
    k = _expand_kv_heads(k, hq, interleaved_kv)
    v = _expand_kv_heads(v, hq, interleaved_kv)
    skv = k.shape[2]

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf, precision="highest") * scale
    bool_mask = materialize_mask(mask, sq, skv, ranges=mask_ranges)
    s = jnp.where(bool_mask[None, None], s, mask_value)
    if bias is not None:
        s = s + bias.astype(jnp.float32)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    lsum = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vf, precision="highest") / lsum
    l = (m + jnp.log(lsum))[..., 0]
    return o, l


@partial(
    jax.jit,
    static_argnames=("scale", "mask", "interleaved_kv", "mask_value"),
)
def reference_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    l: jnp.ndarray,
    do: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    mask: MaskSpec = FULL,
    mask_ranges: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    interleaved_kv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Golden analytic backward from saved (o, l) residuals.

    Mirrors the reference's backward factoring (``README.md:140-189``):
      D  = rowsum(dO ⊙ O)
      P  = exp(S·scale − L)           (recomputed from L, never stored)
      dP = dO · Vᵀ
      dS = P ⊙ (dP − D)
      dQ = scale · dS · K;  dK = scale · dSᵀ · Q;  dV = Pᵀ · dO

    Returns (dq, dk, dv, d) with dk/dv reduced back to Hkv heads.
    """
    bsz, hq, sq, dd = q.shape
    hkv = k.shape[1]
    if scale is None:
        scale = float(dd) ** -0.5
    kx = _expand_kv_heads(k, hq, interleaved_kv).astype(jnp.float32)
    vx = _expand_kv_heads(v, hq, interleaved_kv).astype(jnp.float32)
    qf = q.astype(jnp.float32)
    of = o.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    skv = kx.shape[2]

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kx, precision="highest") * scale
    bool_mask = materialize_mask(mask, sq, skv, ranges=mask_ranges)
    s = jnp.where(bool_mask[None, None], s, mask_value)
    if bias is not None:
        s = s + bias.astype(jnp.float32)

    p = jnp.exp(s - l[..., None])  # normalized probabilities (sum to 1)
    d = jnp.sum(dof * of, axis=-1)  # [B, H, Sq]
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vx, precision="highest")
    ds = p * (dp - d[..., None])

    dq = scale * jnp.einsum("bhqk,bhkd->bhqd", ds, kx, precision="highest")
    dk_full = scale * jnp.einsum("bhqk,bhqd->bhkd", ds, qf, precision="highest")
    dv_full = jnp.einsum("bhqk,bhqd->bhkd", p, dof, precision="highest")

    if hkv != hq:
        group = hq // hkv
        if interleaved_kv:
            dk = dk_full.reshape(bsz, group, hkv, skv, dd).sum(axis=1)
            dv = dv_full.reshape(bsz, group, hkv, skv, dd).sum(axis=1)
        else:
            dk = dk_full.reshape(bsz, hkv, group, skv, dd).sum(axis=2)
            dv = dv_full.reshape(bsz, hkv, group, skv, dd).sum(axis=2)
    else:
        dk, dv = dk_full, dv_full
    return dq, dk, dv, d


def reference_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """Convenience: forward only, output only (most tests want this)."""
    return reference_attention(q, k, v, **kwargs)[0]


def reference_attention_vjp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    do: jnp.ndarray,
    **kwargs,
):
    """Gradients via jax.vjp through the dense path — an *independent* second
    golden model (the analog of the reference having both Network.swift and
    referenceAttention).  Used to cross-check the analytic backward above."""

    def f(q_, k_, v_):
        return reference_attention(q_, k_, v_, **kwargs)[0]

    return jax.jit(lambda q, k, v, do: jax.vjp(f, q, k, v)[1](do))(q, k, v, do)
