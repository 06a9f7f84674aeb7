"""Multi-Latent Attention (MLA) — decompression and true latent-space paths.

The reference ships two MLA pieces (SURVEY.md §3.5-3.6):

- ``MLAOptimizedGEMMMFA`` (``Attention/MLAOptimizedGEMMMFA.swift:97-240``):
  decompress the latent KV with two GEMMs (K = latent·W_uk, V = latent·W_uv
  over [B·S, d_c] × [d_c, H·dh]) and run standard attention — implemented
  here as :func:`mla_decompress`.
- a ``mlaCompressed`` kernel type that is a STUB (every codegen switch
  returns no-ops, ``AttentionKernel+Source.swift:22-24``).  The real thing —
  attention computed entirely in the compressed latent space with the
  decompression matrices absorbed into the query/output projections — is
  :func:`mla_absorbed_attention`, new work this build completes.

The absorbed path is the TPU-shaped one: the latent cache c_kv [B, S, d_c]
is SHARED across heads (an MQA problem with head dim d_c), so the flash
kernel's GQA broadcast serves it directly, the KV cache shrinks by
H·dh/d_c, and the latent cache can be INT8/INT4-quantized per token and fed
to the quantized kernel (compressed + sparse + quantized compose freely).

Math (absorption identity):  with K_h = C·W_uk[h], V_h = C·W_uv[h]:
  S_h = Q_h·K_hᵀ = (Q_h·W_uk[h]ᵀ)·Cᵀ       → score in latent space
  O_h = P_h·V_h  = (P_h·C)·W_uv[h]          → output projected after attention
Decoupled RoPE dims (DeepSeek-style) enter as an extra concatenated slice:
  S_h = [Q_lat | Q_rope]·[C | K_rope]ᵀ      → one flash call, D = d_c + d_r.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import FULL, MaskSpec
from metal_flash_attention_plus_tpu.attention.precisions import (
    matmul_precision,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (
    quantized_flash_attention,
)
from metal_flash_attention_plus_tpu.ops.quantized_gemm import quantized_matmul
from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor


def mla_decompress(
    latent: jnp.ndarray,
    w_uk: Union[jnp.ndarray, QuantizedTensor],
    w_uv: Union[jnp.ndarray, QuantizedTensor],
    num_heads: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Latent [B, S, d_c] × W_uk/W_uv [d_c, H·dh] → K, V [B, H, S, dh].

    Reference parity (``MLAOptimizedGEMMMFA.forward``, M = B·S, N = H·dh,
    K = d_c).  Pass QuantizedTensors (stored transposed [H·dh, d_c]) to run
    the decompression through the dequant-on-load GEMM kernel.
    """
    b, s, dc = latent.shape

    def proj(w):
        if isinstance(w, QuantizedTensor):
            n, k2 = w.shape
            assert k2 == dc, (w.shape, dc)
            flat = quantized_matmul(latent.reshape(b * s, dc), w)
            return flat.reshape(b, s, n)
        assert w.shape[0] == dc
        return jnp.matmul(latent, w, precision=matmul_precision(latent.dtype))

    k = proj(w_uk)
    v = proj(w_uv)
    dh = k.shape[-1] // num_heads
    k = k.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    return k, v


def mla_absorbed_attention(
    q: jnp.ndarray,
    c_kv: Union[jnp.ndarray, QuantizedTensor],
    w_uk: jnp.ndarray,
    w_uv: jnp.ndarray,
    *,
    q_rope: Optional[jnp.ndarray] = None,
    k_rope: Optional[jnp.ndarray] = None,
    mask: MaskSpec = FULL,
    mask_ranges: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused latent-space attention (the real ``mlaCompressed``).

    Args:
      q: [B, H, Sq, dh] per-head queries (the NoPE part).
      c_kv: latent KV cache [B, Skv, d_c]; float array or a per-token
        QuantizedTensor of logical shape [B, 1, Skv, d_c].
      w_uk: [H, dh, d_c] key-decompression (absorbed into Q).
      w_uv: [H, d_c, dh] value-decompression (applied after attention).
      q_rope / k_rope: optional decoupled-RoPE slices, [B, H, Sq, d_r] and
        [B, Skv, d_r] (k_rope is shared across heads, DeepSeek-style).
      scale: softmax scale; default 1/sqrt(dh + d_r) — the scale of the
        UNCOMPRESSED attention, not of the latent width.

    Returns [B, H, Sq, dh] in q.dtype.
    """
    b, h, sq, dh = q.shape
    quantized = isinstance(c_kv, QuantizedTensor)
    if quantized:
        _, hkv_c, skv, dc = c_kv.shape
        assert hkv_c == 1, "latent cache is head-shared ([B, 1, Skv, d_c])"
    else:
        _, skv, dc = c_kv.shape
    d_r = 0 if q_rope is None else q_rope.shape[-1]
    if scale is None:
        scale = float(dh + d_r) ** -0.5

    # Absorb W_uk into Q: q_lat[b,h,s,c] = Σ_d q[b,h,s,d]·w_uk[h,d,c].
    prec = matmul_precision(q.dtype)
    q_lat = jnp.einsum(
        "bhsd,hdc->bhsc", q.astype(jnp.float32), w_uk.astype(jnp.float32),
        precision=prec,
    ).astype(q.dtype)

    if q_rope is not None:
        if k_rope is None:
            raise ValueError("q_rope requires k_rope")
        q_lat = jnp.concatenate([q_lat, q_rope.astype(q.dtype)], axis=-1)

    if quantized:
        if q_rope is not None:
            raise NotImplementedError(
                "decoupled RoPE with a quantized latent cache: quantize "
                "[C | K_rope] jointly instead"
            )
        o_lat = quantized_flash_attention(
            q_lat, c_kv, c_kv,
            mask=mask, scale=scale, block_sizes=block_sizes,
            interpret=interpret,
        )
    else:
        kv = c_kv[:, None]  # [B, 1, Skv, d_c] — MQA over the shared latent
        if q_rope is not None:
            k_full = jnp.concatenate(
                [kv, k_rope[:, None].astype(kv.dtype)], axis=-1
            )
            # V stays the bare latent; pad with zeros over the rope slice so
            # one kernel call serves both (the zero tail adds nothing to O).
            v_full = jnp.concatenate(
                [kv, jnp.zeros_like(k_rope[:, None], dtype=kv.dtype)], axis=-1
            )
        else:
            k_full = v_full = kv
        o_lat = flash_attention(
            q_lat, k_full.astype(q_lat.dtype), v_full.astype(q_lat.dtype),
            mask=mask, mask_ranges=mask_ranges, scale=scale,
            block_sizes=block_sizes, interpret=interpret,
        )

    o_lat = o_lat[..., :dc]  # drop the rope tail of O (zeros by construction)
    # Project out of the latent space: o[b,h,s,d] = Σ_c o_lat[b,h,s,c]·w_uv[h,c,d]
    o = jnp.einsum(
        "bhsc,hcd->bhsd",
        o_lat.astype(jnp.float32),
        w_uv.astype(jnp.float32),
        precision=prec,
    )
    return o.astype(q.dtype)
