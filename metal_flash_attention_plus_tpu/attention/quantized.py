"""QuantizedAttention facade — the reference's quantized L5 API.

``Attention/QuantizedAttention.swift``: a ``Configuration`` (per-tensor
precision + strategy + version, Codable) and forward overloads taking
either pre-quantized tensors or raw buffers that get runtime-quantized on
the GPU first (``QuantizedAttention.swift:278-336`` dispatching the fused
blockwise-centered kernel, else a CPU fallback).  Here:

- :class:`QuantizedAttentionConfig` — per-operand bit widths + strategy,
  JSON round-trippable (the Codable analog).
- :meth:`QuantizedAttention.quantize_kv` — fused per-token runtime
  quantization of K/V (ops/runtime_quantization.py under jit; jnp golden
  is the automatic fallback for unsupported layouts).
- :meth:`QuantizedAttention.__call__` — raw Q/K/V in, quantize-then-attend
  (the reference's runtime-quantizing overload).
- :meth:`QuantizedAttention.forward_quantized` — pre-quantized overload.
- :meth:`QuantizedAttention.benchmark` — the built-in FP/INT8/INT4 sweep
  (``QuantizedAttention.swift:878-989``).

Q is never quantized here (reference production behavior: blockwise-Q is
rejected with a warning + per-tensor fallback); use ``quant.ste``'s
fake-quant for QAT on Q.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import (
    FULL,
    MaskKind,
    MaskSpec,
)
from metal_flash_attention_plus_tpu.attention.tuning import AttentionTuner
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes
from metal_flash_attention_plus_tpu.ops.quantized_attention import (
    quantized_flash_attention,
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.runtime_quantization import (
    runtime_quantize,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor

CONFIG_VERSION = 1


@dataclasses.dataclass(frozen=True)
class QuantizedAttentionConfig:
    """Per-operand quantization spec (``QuantizedAttention.Configuration``).

    ``key_bits``/``value_bits``: 8, 4, or None (keep float).  Granularity is
    per-token (the KV-cache production choice) unless ``per_tensor``.

    ``hadamard``: quantize K/V in the Hadamard-rotated basis (the
    reference's ConvRot outlier smoothing, ``HadamardRotation.swift``) —
    Q is rotated on the fly and O un-rotated after the kernel, both exact;
    only the int rounding sees the rotation.  This is the int4 accuracy
    lever (reference measures int4 rel err 0.0206 with it,
    ``GLUON_OPTIMIZATIONS.md:238-242``).
    """

    key_bits: Optional[int] = 8
    value_bits: Optional[int] = 8
    strategy: QuantStrategy = QuantStrategy.CENTERED
    per_tensor: bool = False
    hadamard: bool = False
    version: int = CONFIG_VERSION

    def kv_config(self, bits: int) -> QuantConfig:
        return QuantConfig(
            bits=bits,
            granularity=(
                QuantGranularity.TENSOR
                if self.per_tensor
                else QuantGranularity.ROW
            ),
            strategy=(
                QuantStrategy.SYMMETRIC if self.per_tensor else self.strategy
            ),
        )

    def hadamard_block(self, head_dim: int) -> Optional[int]:
        """Rotation block: the largest power of 2 dividing the head dim
        (the reference's block selection, ≤ 1024)."""
        if not self.hadamard:
            return None
        bs = 1
        while bs * 2 <= min(head_dim, 1024) and head_dim % (bs * 2) == 0:
            bs *= 2
        return bs

    def to_json(self) -> str:
        return json.dumps(
            dict(
                key_bits=self.key_bits,
                value_bits=self.value_bits,
                strategy=self.strategy.value,
                per_tensor=self.per_tensor,
                hadamard=self.hadamard,
                version=self.version,
            )
        )

    @staticmethod
    def from_json(s: str) -> "QuantizedAttentionConfig":
        d = json.loads(s)
        return QuantizedAttentionConfig(
            key_bits=d["key_bits"],
            value_bits=d["value_bits"],
            strategy=QuantStrategy(d["strategy"]),
            per_tensor=d["per_tensor"],
            hadamard=d.get("hadamard", False),
            version=d.get("version", CONFIG_VERSION),
        )


def _quantize_tokens(x: jnp.ndarray, cfg: QuantConfig) -> QuantizedTensor:
    """Per-token quantization of [B, H, S, D] via the fused 2D kernel."""
    b, h, s, d = x.shape
    flat = runtime_quantize(x.reshape(b * h * s, d), cfg)
    data = flat.data.reshape(b, h, s, -1)
    if cfg.granularity == QuantGranularity.ROW:
        scale = flat.scale.reshape(b, h, s, 1)
        zp = flat.zero_point.reshape(b, h, s, 1)
    else:  # TENSOR
        scale, zp = flat.scale, flat.zero_point
    return QuantizedTensor(
        data=data, scale=scale, zero_point=zp, sums=None,
        config=cfg, shape=(b, h, s, d), orig_dtype=x.dtype,
    )


@dataclasses.dataclass(frozen=True)
class QuantizedAttention:
    config: QuantizedAttentionConfig = QuantizedAttentionConfig()
    mask: MaskSpec = FULL
    scale: Optional[float] = None
    interleaved_kv: bool = False
    block_sizes: Optional[BlockSizes] = None

    def _blocks(self, seq_len: int, head_dim: int, bits: int) -> BlockSizes:
        if self.block_sizes is not None:
            return self.block_sizes
        from metal_flash_attention_plus_tpu.attention.masking import (
            MaskKind,
        )

        return AttentionTuner.shared().recommend(
            "fwd_q", head_dim, seq_len, bits=bits,
            causal=self.mask.kind != MaskKind.NONE,
        )

    def quantize_kv(
        self, k: jnp.ndarray, v: jnp.ndarray
    ) -> Tuple[QuantizedTensor, QuantizedTensor]:
        kb = self.config.key_bits or 8
        vb = self.config.value_bits or 8
        hb = self.config.hadamard_block(k.shape[-1])
        if hb:
            from metal_flash_attention_plus_tpu.ops.hadamard import (
                hadamard_transform,
            )

            k = hadamard_transform(k, hb)
            v = hadamard_transform(v, hb)
        return (
            _quantize_tokens(k, self.config.kv_config(kb)),
            _quantize_tokens(v, self.config.kv_config(vb)),
        )

    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        **kw,
    ) -> jnp.ndarray:
        """Raw-tensor overload: runtime-quantize K/V, then attend."""
        kq, vq = self.quantize_kv(k, v)
        return self.forward_quantized(q, kq, vq, bias, **kw)

    def forward_quantized(
        self,
        q: jnp.ndarray,
        k: QuantizedTensor,
        v: QuantizedTensor,
        bias: Optional[jnp.ndarray] = None,
        **kw,
    ) -> jnp.ndarray:
        return quantized_flash_attention(
            q, k, v, bias,
            mask=self.mask, scale=self.scale,
            block_sizes=self._blocks(q.shape[2], q.shape[3], k.config.bits),
            interleaved_kv=self.interleaved_kv,
            hadamard_block=self.config.hadamard_block(q.shape[3]),
            **kw,
        )

    def forward_with_lse(self, q, k, v, bias=None, **kw):
        kq, vq = self.quantize_kv(k, v)
        return quantized_flash_attention_forward(
            q, kq, vq, bias=bias,
            mask=self.mask, scale=self.scale,
            block_sizes=self._blocks(q.shape[2], q.shape[3], kq.config.bits),
            interleaved_kv=self.interleaved_kv,
            hadamard_block=self.config.hadamard_block(q.shape[3]),
            **kw,
        )

    def benchmark(
        self,
        *,
        batch: int = 1,
        num_heads: int = 8,
        seq_len: int = 4096,
        head_dim: int = 64,
        iters: int = 30,
    ) -> dict:
        """FP16/INT8/INT4 sweep (``QuantizedAttention.benchmark`` analog).
        Returns {variant: TFLOP/s}; also reports rel-err vs the bf16 run."""
        from metal_flash_attention_plus_tpu.ops.flash_attention import (
            flash_attention_forward,
        )
        from metal_flash_attention_plus_tpu.utils.profiling import measure
        from metal_flash_attention_plus_tpu.utils.roofline import (
            attention_flops,
        )

        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (batch, num_heads, seq_len, head_dim)
        q = jax.random.normal(ks[0], shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], shape, jnp.float32)
        v = jax.random.normal(ks[2], shape, jnp.float32)
        causal = self.mask.kind == MaskKind.CAUSAL
        flops = attention_flops(
            seq_len, seq_len, head_dim, num_heads=num_heads, batch=batch
        ) / (2 if causal else 1)

        results = {}
        fb = jax.jit(
            lambda q, k, v: flash_attention_forward(
                q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                mask=self.mask, interpret=False,
            )[0]
        )
        o_ref = fb(q, k, v)
        results["bf16_tflops"] = flops / measure(fb, q, k, v, iters=iters) / 1e12

        for bits in (8, 4):
            cfg = dataclasses.replace(
                self.config, key_bits=bits, value_bits=bits
            )
            qa = dataclasses.replace(self, config=cfg)
            kq, vq = qa.quantize_kv(k, v)
            f = jax.jit(
                lambda q, kq=kq, vq=vq, qa=qa: qa.forward_quantized(
                    q, kq, vq, interpret=False
                )
            )
            o = f(q)
            rel = float(
                jnp.linalg.norm((o - o_ref).astype(jnp.float32))
                / jnp.linalg.norm(o_ref.astype(jnp.float32))
            )
            results[f"int{bits}_tflops"] = (
                flops / measure(f, q, iters=iters) / 1e12
            )
            results[f"int{bits}_rel_err"] = rel
        return results
