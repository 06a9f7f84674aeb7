"""Weight-quantized (W8A8) transformer inference.

The end-to-end quantized serving path the reference's engine exists for
(its PyTorch integration runs quantized attention inside fp16 models;
here the WHOLE model runs quantized): every projection weight is stored
int8 per-output-channel (``QuantizedTensor``, ROW symmetric), and every
matmul runs :func:`dynamic_quantized_matmul` — runtime per-row int8
activation quantization feeding the int8 MXU (measured faster than the
bf16 matmul path at prefill shapes, docs/perf_notes.md).  Attention
itself can additionally run the int8-KV quantized flash kernel via
``quantize_kv=True``.

Inference-only by design: for TRAINING with quantization use
``quant.ste.fake_quantize`` (QAT) — gradients do not flow through the
integer weights here.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    _merge_heads,
    _split_heads,
    rms_norm,
    rope,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
    dynamic_quantized_matmul,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import (
    QuantizedTensor,
    quantize,
)

Params = Dict[str, Any]

WEIGHT_CFG = QuantConfig(
    bits=8,
    granularity=QuantGranularity.ROW,
    strategy=QuantStrategy.SYMMETRIC,
)

_PROJ_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def quantize_weights(params: Params, cfg: QuantConfig = WEIGHT_CFG) -> Params:
    """Float params → int8 params: each projection [in, out] is stored as a
    ``QuantizedTensor`` over the TRANSPOSED [out, in] layout (per-output-
    channel scales; the GEMM's expected Bᵀ operand).  Embedding (a gather)
    and norm gains stay float; the unembedding is quantized too."""

    def qt(w):
        return quantize(jnp.transpose(w).astype(jnp.float32), cfg)

    out = dict(params)
    out["layers"] = [
        {
            k: (qt(v) if k in _PROJ_KEYS else v)
            for k, v in layer.items()
        }
        for layer in params["layers"]
    ]
    out["unembed"] = qt(params["unembed"])
    return out


_MLA_PROJ_KEYS = ("wq", "wqr", "wdkv", "wkr", "wo", "wg", "wu", "wd")


def quantize_mla_weights(
    params: Params, cfg: QuantConfig = WEIGHT_CFG
) -> Params:
    """MLA-family analog of :func:`quantize_weights`: every 2-D projection
    (NoPE/RoPE queries, latent down-projection, shared RoPE key, output,
    MLP, unembed) becomes a transposed ``QuantizedTensor``; the absorbed
    3-D up-projections ``w_uk``/``w_uv`` stay float (they ride inside the
    latent attention kernel, not through a GEMM dispatch)."""

    def qt(w):
        return quantize(jnp.transpose(w).astype(jnp.float32), cfg)

    out = dict(params)
    out["layers"] = [
        {
            k: (qt(v) if k in _MLA_PROJ_KEYS else v)
            for k, v in layer.items()
        }
        for layer in params["layers"]
    ]
    out["unembed"] = qt(params["unembed"])
    return out


def _linear(x: jnp.ndarray, wq: QuantizedTensor, out_dtype) -> jnp.ndarray:
    """[..., K] × int8 [N, K] → [..., N] via the dynamic W8A8 GEMM."""
    from metal_flash_attention_plus_tpu.attention.tuning import (
        AttentionTuner,
    )

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    bm, bn, bk = AttentionTuner.shared().recommend_gemm(
        x2.shape[0], wq.shape[0], wq.shape[1], bits=wq.config.bits
    )
    y = dynamic_quantized_matmul(
        x2, wq, block_m=bm, block_n=bn, block_k=bk, out_dtype=jnp.float32
    )
    return y.reshape(*lead, y.shape[-1]).astype(out_dtype)


def quantized_forward(
    params: Params,
    tokens: jnp.ndarray,
    cfg: TransformerConfig,
    *,
    quantize_kv: bool = False,
    positions=None,
    packed_d64: bool = None,
) -> jnp.ndarray:
    """tokens [B, S] → logits [B, S, V] fp32, all projections W8A8.

    ``quantize_kv=True`` additionally runs attention over runtime-
    quantized int8 K/V (per-token symmetric) with int8-Q scores — the
    fully-quantized pipeline (weights + activations + attention).

    ``packed_d64`` (default: auto when head_dim == 64, even heads, and
    ``quantize_kv``): run attention in the PACKED head-pair layout — Q is
    produced packed straight out of the projection (head pairs are
    adjacent in the channel axis, so this costs the same transpose as the
    natural split), rope applies lane-locally, O is consumed packed by
    the output projection.  ZERO per-call pack/unpack transposes — the
    d=64 head-pair kernel's rate survives end-to-end (round 5; exp35/37).
    K/V quantize per-CHANNEL symmetric (the packed kernel's folded-scale
    contract)."""
    from metal_flash_attention_plus_tpu.models.transformer import (
        _merge_heads_packed,
        _split_heads_packed,
        rope_packed,
    )
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_forward_packed,
    )

    _, s = tokens.shape
    if positions is None:
        positions = jnp.arange(s)
    if packed_d64 is None:
        packed_d64 = (
            quantize_kv and cfg.head_dim == 64 and cfg.num_heads % 2 == 0
            and s % 128 == 0
        )
    x = params["embed"][tokens]
    dt = x.dtype
    kv_cfg = QuantConfig(
        bits=8,
        granularity=(
            QuantGranularity.CHANNEL if packed_d64 else QuantGranularity.ROW
        ),
        strategy=QuantStrategy.SYMMETRIC,
    )
    for layer in params["layers"]:
        h = rms_norm(x, layer["ln1"])
        qh = _linear(h, layer["wq"], dt)
        k = _split_heads(
            _linear(h, layer["wk"], dt), cfg.num_kv_heads, cfg.head_dim
        )
        v = _split_heads(
            _linear(h, layer["wv"], dt), cfg.num_kv_heads, cfg.head_dim
        )
        k = rope(k, positions, cfg.rope_theta)
        if packed_d64:
            q = rope_packed(
                _split_heads_packed(qh, cfg.num_heads), positions,
                cfg.rope_theta,
            )
            kq = quantize(k.astype(jnp.float32), kv_cfg)
            vq = quantize(v.astype(jnp.float32), kv_cfg)
            o, _ = quantized_flash_attention_forward_packed(
                q, kq, vq, mask=CAUSAL, block_sizes=cfg.block_sizes,
            )
            x = x + _linear(_merge_heads_packed(o.astype(dt)),
                            layer["wo"], dt)
            h2 = rms_norm(x, layer["ln2"])
            y = jax.nn.silu(
                _linear(h2, layer["wg"], jnp.float32)
            ) * _linear(h2, layer["wu"], jnp.float32)
            x = x + _linear(y.astype(dt), layer["wd"], dt)
            continue
        q = rope(
            _split_heads(qh, cfg.num_heads, cfg.head_dim), positions,
            cfg.rope_theta,
        )
        if quantize_kv:
            kq = quantize(k.astype(jnp.float32), kv_cfg)
            vq = quantize(v.astype(jnp.float32), kv_cfg)
            o, _ = quantized_flash_attention_forward(
                q, kq, vq, mask=CAUSAL, block_sizes=cfg.block_sizes,
                quantize_q=True,
            )
        else:
            o, _ = flash_attention_forward(
                q, k, v, mask=CAUSAL, block_sizes=cfg.block_sizes
            )
        x = x + _linear(_merge_heads(o.astype(dt)), layer["wo"], dt)
        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu(
            _linear(h2, layer["wg"], jnp.float32)
        ) * _linear(h2, layer["wu"], jnp.float32)
        x = x + _linear(y.astype(dt), layer["wd"], dt)
    hf = rms_norm(x, params["ln_f"])
    return _linear(hf, params["unembed"], jnp.float32)


def memory_footprint(params: Params) -> Dict[str, int]:
    """Bytes per parameter group — the W8 compression receipt."""

    def nbytes(t):
        if isinstance(t, QuantizedTensor):
            return (
                t.data.nbytes + t.scale.nbytes + t.zero_point.nbytes
            )
        return t.nbytes

    total = 0
    for leaf in jax.tree.leaves(
        params,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    ):
        total += nbytes(leaf)
    return {"total_bytes": total}
