"""MLA (multi-latent attention) transformer — the compressed-KV model family.

DeepSeek-style factoring on top of ``ops/mla.py``: per layer the KV path is
compressed to a shared latent ``c_kv = x·W_dkv`` ([d_model → d_c]) plus a
small decoupled-RoPE key ``k_rope = rope(x·W_kr)`` shared across heads;
queries carry a NoPE part (absorbed against W_uk) and a RoPE part.  The
per-token cache state is ``d_c + d_r`` floats instead of ``2·H·d_h`` — the
compression the reference's ``MLAOptimizedGEMMMFA`` decompression serves,
with attention running IN latent space (the real ``mlaCompressed``).

Same functional-params style as models/transformer.py; numerically pinned
against decompress-then-attend in tests (the absorption identity).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.models.transformer import (
    linear,
    rms_norm,
    rope,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes
from metal_flash_attention_plus_tpu.ops.mla import mla_absorbed_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MLAConfig:
    vocab_size: int = 32768
    d_model: int = 1024
    num_layers: int = 8
    num_heads: int = 16
    head_dim: int = 64  # per-head NoPE dim (absorbed against the latent)
    latent_dim: int = 256  # d_c — the shared compressed KV width
    rope_dim: int = 32  # d_r — decoupled positional key width
    d_ff: int = 4096
    max_seq: int = 2048
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    block_sizes: BlockSizes = BlockSizes()

    @property
    def cache_width(self) -> int:
        """Per-token serving-cache state: latent + rope key."""
        return self.latent_dim + self.rope_dim


def init_mla_params(cfg: MLAConfig, key: jax.Array) -> Params:
    d, h, dh = cfg.d_model, cfg.num_heads, cfg.head_dim
    dc, dr, f, v = cfg.latent_dim, cfg.rope_dim, cfg.d_ff, cfg.vocab_size
    keys = jax.random.split(key, 4 + cfg.num_layers)

    def dense(k, shape, fan_in):
        return (
            jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5
        ).astype(cfg.dtype)

    layers = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[4 + i], 8)
        layers.append(
            dict(
                ln1=jnp.ones((d,), jnp.float32),
                wq=dense(ks[0], (d, h * dh), d),  # NoPE queries
                wqr=dense(ks[1], (d, h * dr), d),  # RoPE queries
                wdkv=dense(ks[2], (d, dc), d),  # latent down-projection
                wkr=dense(ks[3], (d, dr), d),  # shared RoPE key
                w_uk=dense(ks[4], (h, dh, dc), dc),  # key up (absorbed)
                w_uv=dense(ks[5], (h, dc, dh), dc),  # value up
                wo=dense(ks[6], (h * dh, d), h * dh),
                ln2=jnp.ones((d,), jnp.float32),
                wg=dense(ks[7], (d, f), d),
                wu=dense(jax.random.fold_in(ks[7], 1), (d, f), d),
                wd=dense(jax.random.fold_in(ks[7], 2), (f, d), f),
            )
        )
    return dict(
        embed=dense(keys[0], (v, d), d),
        layers=layers,
        ln_f=jnp.ones((d,), jnp.float32),
        unembed=dense(keys[1], (d, v), d),
    )


def mla_layer_kv(layer, h_norm, positions, cfg: MLAConfig):
    """The per-token cache state: (c_kv [B,S,dc], k_rope [B,S,dr]).

    Projections go through the polymorphic ``linear`` so the weights may
    arrive as W8A8/W4A8 ``QuantizedTensor``s (quantized MLA serving)."""
    c_kv = linear(h_norm, layer["wdkv"])
    k_rope = rope(
        linear(h_norm, layer["wkr"])[:, None],  # [B,1,S,dr] — head-shared
        positions,
        cfg.rope_theta,
    )[:, 0]
    return c_kv, k_rope


def mla_layer_q(layer, h_norm, positions, cfg: MLAConfig):
    """Per-head queries: (q_nope [B,H,S,dh], q_rope [B,H,S,dr])."""
    b, s, _ = h_norm.shape
    h, dh, dr = cfg.num_heads, cfg.head_dim, cfg.rope_dim
    q = linear(h_norm, layer["wq"]).reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    qr = linear(h_norm, layer["wqr"]).reshape(b, s, h, dr).transpose(0, 2, 1, 3)
    qr = rope(qr, positions, cfg.rope_theta)
    return q, qr


def mla_forward(
    params: Params,
    tokens: jnp.ndarray,
    cfg: MLAConfig,
    positions=None,
) -> jnp.ndarray:
    """tokens [B, S] → logits [B, S, V] (training/prefill path)."""
    b, s = tokens.shape
    if positions is None:
        positions = jnp.arange(s)
    x = params["embed"][tokens]
    for layer in params["layers"]:
        hn = rms_norm(x, layer["ln1"])
        q, qr = mla_layer_q(layer, hn, positions, cfg)
        c_kv, k_rope = mla_layer_kv(layer, hn, positions, cfg)
        o = mla_absorbed_attention(
            q, c_kv.astype(jnp.float32),
            layer["w_uk"].astype(jnp.float32),
            layer["w_uv"].astype(jnp.float32),
            q_rope=qr, k_rope=k_rope.astype(jnp.float32),
            mask=CAUSAL, block_sizes=cfg.block_sizes,
        )
        attn = o.transpose(0, 2, 1, 3).reshape(b, s, -1).astype(x.dtype)
        x = x + linear(attn, layer["wo"], x.dtype)
        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu(linear(h2, layer["wg"], jnp.float32)) * linear(
            h2, layer["wu"], jnp.float32
        )
        x = x + linear(y.astype(x.dtype), layer["wd"], x.dtype)
    hf = rms_norm(x, params["ln_f"])
    return linear(hf, params["unembed"], jnp.float32)


def mla_loss_fn(params, tokens, cfg: MLAConfig):
    logits = mla_forward(params, tokens[:, :-1], cfg)
    targets = tokens[:, 1:]
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(lse - tgt)
