"""Ulysses-style sequence parallelism: all-to-all head↔sequence reshard.

The alternative SP strategy (SURVEY.md §2.5): instead of rotating KV chunks
(ring), re-shard once — sequence-sharded [B, H, S/N, D] becomes head-sharded
[B, H/N, S, D] via ``all_to_all``, attention runs locally over the *full*
sequence (so every mask the single-device kernel supports works unchanged),
and the output is resharded back.  Two all-to-alls per call vs the ring's
N−1 ppermutes; wins when N is small relative to head count and the mask is
irregular (sparse ranges / external bias), loses to ring at very long
contexts where the full-sequence KV doesn't fit.

Differentiability is free: ``all_to_all`` is linear and the inner
:func:`flash_attention` carries its own custom_vjp.

Call INSIDE shard_map with sequence-sharded operands.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, MaskSpec
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention,
)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "context",
    *,
    mask: MaskSpec = CAUSAL,
    mask_ranges=None,
    bias=None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel attention via head↔sequence all-to-all.

    Args:
      q: local [B, Hq, S_local, D]; Hq must be divisible by the axis size.
      k, v: local [B, Hkv, S_local, D]; KV heads are replicated up to the
        axis size first if Hkv < N (the GQA broadcast absorbs it).

    Returns:
      Local O chunk [B, Hq, S_local, D].
    """
    n = jax.lax.psum(1, axis_name)
    b, hq, s_loc, d = q.shape
    hkv = k.shape[1]
    if hq % n != 0:
        raise ValueError(f"Hq={hq} not divisible by axis size {n}")
    if interleaved_kv and hkv != hq and n > 1:
        # The interleaved (h % Hkv) GQA mapping is global over heads; the
        # all-to-all's contiguous head split cannot preserve it.  Use the
        # grouped (contiguous) mapping or ring attention instead.
        raise ValueError(
            "ulysses_attention: interleaved_kv GQA is unsupported "
            "(contiguous head chunks cross interleaved kv groups)"
        )
    if hkv % n != 0:
        if n % hkv != 0:
            raise ValueError(f"Hkv={hkv} vs axis size {n}: need divisibility")
        # Replicate KV heads so each shard gets at least one; contiguous
        # grouping keeps each q-head chunk aligned with its kv head after
        # the all-to-all.
        reps = n // hkv
        k = jnp.repeat(k, reps, axis=1)
        v = jnp.repeat(v, reps, axis=1)

    def to_heads(x):
        # [B, H, S/N, D] -> [B, H/N, S, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    q_h = to_heads(q)
    k_h = to_heads(k)
    v_h = to_heads(v)

    o_h = flash_attention(
        q_h, k_h, v_h, bias, mask_ranges,
        mask=mask, scale=scale, block_sizes=block_sizes,
        interleaved_kv=interleaved_kv,
    )
    # [B, H/N, S, D] -> [B, H, S/N, D]
    return jax.lax.all_to_all(
        o_h, axis_name, split_axis=2, concat_axis=1, tiled=True
    )
