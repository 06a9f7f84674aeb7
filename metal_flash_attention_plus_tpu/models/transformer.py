"""Flagship decoder-only GQA transformer (single-device golden path).

A deliberately plain functional-JAX implementation (params are a nested
dict pytree) so that the SPMD version (``parallel/spmd.py``) is a
line-for-line manual sharding of THIS code and can be tested against it
numerically on a virtual mesh.

Architecture: pre-RMSNorm, rotary embeddings, GQA flash attention (the
framework's Pallas kernel), SwiGLU MLP, untied LM head.  The attention call
is the production dispatch path — the model is how the kernel zoo gets
exercised end-to-end (causal masking, GQA broadcast, bf16 inputs with fp32
softmax statistics).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32768
    d_model: int = 1024
    num_layers: int = 8
    num_heads: int = 16
    num_kv_heads: int = 4
    head_dim: int = 64
    d_ff: int = 4096
    max_seq: int = 2048
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    block_sizes: BlockSizes = BlockSizes()
    # Rematerialize each layer's activations in backward (jax.checkpoint):
    # trades one extra forward pass per layer for O(1) live activations —
    # the VMEM/HBM lever the reference's register-spilling tricks stand in
    # for on Metal.
    remat: bool = False

    def __post_init__(self):
        assert self.num_heads % self.num_kv_heads == 0

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


def init_params(cfg: TransformerConfig, key: jax.Array) -> Params:
    """Scaled-normal init; weights stored in ``cfg.dtype`` (bf16 master
    weights are fine for the benchmark/demo scope of this model)."""
    d, q, kv, f, v = cfg.d_model, cfg.q_dim, cfg.kv_dim, cfg.d_ff, cfg.vocab_size
    n_keys = 4 + cfg.num_layers
    keys = jax.random.split(key, n_keys)

    def dense(k, shape, fan_in):
        return (
            jax.random.normal(k, shape, jnp.float32) * (fan_in**-0.5)
        ).astype(cfg.dtype)

    layers = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[4 + i], 7)
        layers.append(
            dict(
                ln1=jnp.ones((d,), jnp.float32),
                wq=dense(ks[0], (d, q), d),
                wk=dense(ks[1], (d, kv), d),
                wv=dense(ks[2], (d, kv), d),
                wo=dense(ks[3], (q, d), q),
                ln2=jnp.ones((d,), jnp.float32),
                wg=dense(ks[4], (d, f), d),
                wu=dense(ks[5], (d, f), d),
                wd=dense(ks[6], (f, d), f),
            )
        )
    return dict(
        embed=dense(keys[0], (v, d), d),
        layers=layers,
        ln_f=jnp.ones((d,), jnp.float32),
        unembed=dense(keys[1], (d, v), d),
    )


def linear(x: jnp.ndarray, w, out_dtype=None) -> jnp.ndarray:
    """Projection that accepts dense [K, N] floats OR a W8 ``QuantizedTensor``
    stored transposed [N, K] (``models.quantized_inference.quantize_weights``
    layout) — the latter runs the dynamic W8A8 int8-MXU GEMM.  This is what
    lets the serving executors run quantized weights transparently (the
    reference's production quantized path,
    ``QuantizedAttention.swift:135-263``)."""
    from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor

    odt = out_dtype or x.dtype
    if isinstance(w, QuantizedTensor):
        from metal_flash_attention_plus_tpu.attention.tuning import (
            AttentionTuner,
        )
        from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
            dynamic_quantized_matmul,
        )

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        bm, bn, bk = AttentionTuner.shared().recommend_gemm(
            x2.shape[0], w.shape[0], w.shape[1], bits=w.config.bits
        )
        y = dynamic_quantized_matmul(
            x2, w, block_m=bm, block_n=bn, block_k=bk,
            out_dtype=jnp.float32,
        )
        return y.reshape(*lead, y.shape[-1]).astype(odt)
    return (x @ w).astype(odt)


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding. x: [B, H, S, D] (D even), positions: [S] or [B, S]."""
    d = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, d // 2, dtype=jnp.float32) / (d // 2))
    if positions.ndim == 1:
        ang = positions[:, None].astype(jnp.float32) * freqs[None, :]  # [S, d/2]
        ang = ang[None, None]  # [1, 1, S, d/2]
    else:
        ang = positions[..., None].astype(jnp.float32) * freqs  # [B, S, d/2]
        ang = ang[:, None]  # [B, 1, S, d/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _split_heads(x: jnp.ndarray, num_heads: int, head_dim: int) -> jnp.ndarray:
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _split_heads_packed(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Projection output → PACKED d=64 layout [B, H/2, S, 128].

    Head pairs are ADJACENT in the projection's channel axis
    ([h0|h1|h2|…]·64 lanes), so producing the packed layout costs exactly
    the same transpose as the natural split — the lane-concatenation the
    d=64 head-pair kernel needs is absorbed into the weight layout for
    free.  This is the round-5 packed-layout thesis: the exp35 kernel
    rate survives production because no per-call pack/unpack exists.
    """
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads // 2, 128).transpose(0, 2, 1, 3)


def _merge_heads_packed(x: jnp.ndarray) -> jnp.ndarray:
    """PACKED [B, H/2, S, 128] → [B, S, H·64] with heads in natural
    order (pairs were adjacent) — ``wo`` applies unchanged."""
    b, h2, s, d2 = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h2 * d2)


def rope_packed(
    x: jnp.ndarray, positions: jnp.ndarray, theta: float
) -> jnp.ndarray:
    """Rotary embedding over the PACKED d=64 layout [B, H/2, S, 128]:
    each 64-lane half is an independent head, so the rotate-half
    structure applies per half — pure lane-sliced elementwise ops, no
    transposes (matches :func:`rope` on the unpacked heads exactly)."""
    half = 32  # head_dim 64 → 32-lane rotation halves
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    if positions.ndim == 1:
        ang = positions[:, None].astype(jnp.float32) * freqs[None, :]
        ang = ang[None, None]  # [1, 1, S, 32]
    else:
        ang = positions[..., None].astype(jnp.float32) * freqs
        ang = ang[:, None]  # [B, 1, S, 32]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    a1, a2, b1, b2 = jnp.split(x.astype(jnp.float32), 4, axis=-1)
    out = jnp.concatenate(
        [a1 * cos - a2 * sin, a2 * cos + a1 * sin,
         b1 * cos - b2 * sin, b2 * cos + b1 * sin],
        axis=-1,
    )
    return out.astype(x.dtype)


def attention_block(
    layer: Params,
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cfg: TransformerConfig,
    attn_fn=None,
) -> jnp.ndarray:
    """Pre-norm attention sublayer.  ``attn_fn(q, k, v)`` defaults to causal
    flash attention — the SPMD layer swaps in ring/Ulysses variants."""
    h = rms_norm(x, layer["ln1"])
    q = _split_heads(h @ layer["wq"], cfg.num_heads, cfg.head_dim)
    k = _split_heads(h @ layer["wk"], cfg.num_kv_heads, cfg.head_dim)
    v = _split_heads(h @ layer["wv"], cfg.num_kv_heads, cfg.head_dim)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)
    if attn_fn is None:
        attn_fn = functools.partial(
            flash_attention, mask=CAUSAL, block_sizes=cfg.block_sizes
        )
    o = attn_fn(q, k, v)
    return x + (_merge_heads(o.astype(x.dtype)) @ layer["wo"]).astype(x.dtype)


def mlp_block(layer: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = rms_norm(x, layer["ln2"])
    y = jax.nn.silu((h @ layer["wg"]).astype(jnp.float32)) * (
        h @ layer["wu"]
    ).astype(jnp.float32)
    return x + (y.astype(x.dtype) @ layer["wd"]).astype(x.dtype)


def forward(
    params: Params,
    tokens: jnp.ndarray,
    cfg: TransformerConfig,
    attn_fn=None,
    positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """tokens [B, S] int32 → logits [B, S, V] fp32."""
    _, s = tokens.shape
    if positions is None:
        positions = jnp.arange(s)
    x = params["embed"][tokens]

    def layer_fn(layer, x):
        x = attention_block(layer, x, positions, cfg, attn_fn=attn_fn)
        return mlp_block(layer, x)

    if cfg.remat:
        layer_fn = jax.checkpoint(layer_fn)
    for layer in params["layers"]:
        x = layer_fn(layer, x)
    h = rms_norm(x, params["ln_f"])
    return (h @ params["unembed"]).astype(jnp.float32)


def loss_fn(
    params: Params,
    tokens: jnp.ndarray,
    cfg: TransformerConfig,
    attn_fn=None,
) -> jnp.ndarray:
    """Next-token cross entropy, mean over all predicted positions."""
    logits = forward(params, tokens[:, :-1], cfg, attn_fn=attn_fn)
    targets = tokens[:, 1:]
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(lse - tgt)


def make_train_step(cfg: TransformerConfig, optimizer):
    """Single-device train step (the golden model for parallel/spmd.py)."""

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates
        )
        return params, opt_state, loss

    return step
