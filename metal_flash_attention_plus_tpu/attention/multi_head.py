"""MultiHeadAttention dispatch facade — the reference's L5 API surface.

``MultiHeadAttention.forward/encodeForward/backward``
(``Attention/MultiHeadAttention.swift:33-83, 197-234, 574-707``) translated
to the TPU build: pipeline caches become ``jax.jit``'s compilation cache
(keyed on static shapes/config — the exact bug class the reference fixed by
hand at ``MultiHeadAttention.swift:439-450``, where function constants baked
into a PSO made source-hash-only cache keys reuse wrong-shape pipelines;
XLA's cache key IS the full static signature, so that bug cannot exist
here), buffer-slot maps become function arguments, and the dispatch
strategies (perBatchHead/perBatch/batched) collapse into the kernel's 3D
grid (batch × heads × live tiles) which already IS the "batched" strategy.

L (logsumexp) is always computed and returned by forward — the reference
always writes L and zero-fills scratch when the caller passes nil
(``MultiHeadAttention.swift:295-319``); returning it unconditionally kills
the same bug class with less machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.descriptor import (
    AttentionDescriptor,
)
from metal_flash_attention_plus_tpu.attention.tuning import AttentionTuner
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention,
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
    flash_attention_backward,
)


@dataclasses.dataclass(frozen=True)
class MultiHeadAttention:
    """Stateless dispatcher bound to a static :class:`AttentionDescriptor`.

    ``block_sizes=None`` consults the :class:`AttentionTuner` (calibrated
    per-device JSON store, else the VMEM cold-start table) per call.
    """

    descriptor: AttentionDescriptor
    block_sizes: Optional[BlockSizes] = None

    def _blocks(self, seq_len: int, kind: str = "fwd") -> BlockSizes:
        if self.block_sizes is not None:
            return self.block_sizes
        from metal_flash_attention_plus_tpu.attention.masking import (
            MaskKind,
        )

        return AttentionTuner.shared().recommend(
            kind, self.descriptor.head_dim, seq_len,
            causal=self.descriptor.mask.kind != MaskKind.NONE,
        )

    def _validate(self, q, k, v):
        d = self.descriptor
        b, hq, sq, hd = q.shape
        bk, hkv, skv, hdk = k.shape
        if hd != d.head_dim or hdk != d.head_dim:
            raise ValueError(
                f"head_dim mismatch: tensors {hd}/{hdk} vs descriptor {d.head_dim}"
            )
        if hq != d.num_q_heads or hkv != d.kv_heads:
            raise ValueError(
                f"head counts ({hq}, {hkv}) do not match descriptor "
                f"({d.num_q_heads}, {d.kv_heads})"
            )
        if v.shape != k.shape or bk != b:
            raise ValueError(f"k/v/batch mismatch: {q.shape} {k.shape} {v.shape}")

    def forward(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        *,
        mask_ranges: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        interpret: Optional[bool] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (O [B,H,Sq,D] in descriptor.output_dtype, L [B,H,Sq] fp32)."""
        self._validate(q, k, v)
        d = self.descriptor
        return flash_attention_forward(
            q, k, v,
            mask=d.mask, mask_ranges=mask_ranges, bias=bias,
            scale=d.scale_or_default(),
            block_sizes=self._blocks(q.shape[2]),
            interleaved_kv=d.interleaved_kv,
            out_dtype=d.output_dtype,
            interpret=interpret,
        )

    def __call__(self, q, k, v, bias=None, mask_ranges=None, **kw):
        """Differentiable forward (O only) — the production entry point."""
        self._validate(q, k, v)
        d = self.descriptor
        return flash_attention(
            q, k, v, bias, mask_ranges,
            mask=d.mask, scale=d.scale_or_default(),
            block_sizes=self._blocks(q.shape[2]),
            interleaved_kv=d.interleaved_kv,
            **kw,
        )

    def backward(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        o: jnp.ndarray,
        logsumexp: jnp.ndarray,
        do: jnp.ndarray,
        *,
        bias: Optional[jnp.ndarray] = None,
        mask_ranges: Optional[jnp.ndarray] = None,
        interpret: Optional[bool] = None,
    ):
        """Explicit backward from saved residuals → (dq, dk, dv)
        (``MultiHeadAttention.backward``'s two-phase encode,
        ``MultiHeadAttention.swift:574-707``)."""
        d = self.descriptor
        dq, dk, dv, _ = flash_attention_backward(
            q, k, v, o, logsumexp, do,
            mask=d.mask, mask_ranges=mask_ranges, bias=bias,
            scale=d.scale_or_default(),
            block_sizes=self._blocks(q.shape[2], "bwd"),
            interleaved_kv=d.interleaved_kv,
            interpret=interpret,
        )
        return dq, dk, dv
