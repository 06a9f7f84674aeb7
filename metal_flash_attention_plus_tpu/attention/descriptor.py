"""Problem descriptors — TPU-native analog of the reference's L4 layer.

The reference resolves ``AttentionDescriptor`` → ``AttentionKernelDescriptor``
via hand-tuned per-device parameter tables and bakes the result into Metal
function constants (``AttentionDescriptor.swift:80-190``,
``AttentionDescriptor+Parameters.swift``).  On TPU the analog is: a frozen,
hashable descriptor used as a ``jax.jit`` static argument; "function
constants" become Python closure constants specializing the Pallas kernel;
block sizes come from a VMEM-budget table (``attention.params``) instead of a
register-pressure table.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import MaskSpec, FULL


class BroadcastMode(enum.Enum):
    """Multi-head broadcast modes (``MultiHeadAttentionDescriptor.swift:43-109``).

    STANDARD: num_q_heads == num_kv_heads.
    GQA: num_q_heads % num_kv_heads == 0; q head ``h`` uses kv head
      ``h // (num_q_heads // num_kv_heads)`` (grouped — the TPU/GQA-standard
      contiguous mapping; the reference's in-kernel ``h % num_kv_heads``
      (``AttentionKernel+Source.swift:84-87``) is an interleaved variant of
      the same broadcast and is available via ``interleaved_kv=True``).
    MQA: single shared KV head.
    CROSS: distinct kv sequence length (encoder-decoder).
    """

    STANDARD = "standard"
    GQA = "gqa"
    MQA = "mqa"
    CROSS = "cross"


@dataclasses.dataclass(frozen=True)
class MultiHeadShape:
    """B, H, S, D shape tuple (``MultiHeadAttentionDescriptor.swift:11-40``)."""

    batch: int
    num_heads: int
    seq_len: int
    head_dim: int

    def as_tuple(self):
        return (self.batch, self.num_heads, self.seq_len, self.head_dim)


@dataclasses.dataclass(frozen=True)
class AttentionDescriptor:
    """Static attention problem spec (``AttentionDescriptor.swift:17-43``).

    Everything here is trace-time static; tensor-valued companions (sparse
    range arrays, external bias, quantization scale arrays) travel alongside
    as regular jnp arrays.

    ``softmax_scale`` of ``None`` means ``1/sqrt(head_dim)`` (reference
    default).  ``logsumexp`` is always computed and returned by the forward
    kernel — the reference always writes L and documents why
    (``MultiHeadAttention.swift:295-319``); we keep that decision.
    """

    head_dim: int
    num_q_heads: int = 1
    num_kv_heads: Optional[int] = None  # None => == num_q_heads
    mask: MaskSpec = FULL
    softmax_scale: Optional[float] = None
    interleaved_kv: bool = False  # reference's h % num_kv_heads mapping
    # Precision policy (AttentionDescriptor+Precisions.swift): memory dtype of
    # inputs; O and L are always fp32 in memory; softmax stats always fp32.
    input_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        nkv = self.num_kv_heads
        if nkv is not None and self.num_q_heads % nkv != 0:
            raise ValueError(
                f"num_q_heads={self.num_q_heads} must be divisible by "
                f"num_kv_heads={nkv}"
            )

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_q_heads

    @property
    def q_per_kv(self) -> int:
        return self.num_q_heads // self.kv_heads

    @property
    def broadcast_mode(self) -> BroadcastMode:
        if self.kv_heads == self.num_q_heads:
            return BroadcastMode.STANDARD
        if self.kv_heads == 1:
            return BroadcastMode.MQA
        return BroadcastMode.GQA

    def kv_head_for(self, q_head: int) -> int:
        """Host-side Q-head → KV-head mapping used by kernel index maps."""
        if self.interleaved_kv:
            return q_head % self.kv_heads
        return q_head // self.q_per_kv

    def scale_or_default(self) -> float:
        if self.softmax_scale is not None:
            return float(self.softmax_scale)
        return float(self.head_dim) ** -0.5
