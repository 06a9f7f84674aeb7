"""MLA serving: latent-cache prefill + decode over the paged pools.

The compression payoff of MLA at serving time: the per-token cache state is
ONE vector ``[c_kv | k_rope]`` of width d_c + d_r shared across heads
(vs 2·H·d_h for GQA) — e.g. 288 vs 1024 floats for H=8, d_h=64.  One page
pool serves both K and V: the paged kernels read K as the full vector and
zero the rope tail for V (``v_tail_zero``), with the head dimension of the
attention being the latent width (an MQA problem, Hkv = 1).

Numerically pinned against the uncached ``mla_forward`` in
tests/test_mla_serving.py (token-exact greedy decoding).
"""

from __future__ import annotations

import dataclasses as _dc
from typing import Tuple

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.models.mla_transformer import (
    MLAConfig,
    mla_layer_kv,
    mla_layer_q,
)
from metal_flash_attention_plus_tpu.models.transformer import (
    linear,
    rms_norm,
)
from metal_flash_attention_plus_tpu.serving.kv_cache import PagedKVCache
from metal_flash_attention_plus_tpu.serving.paged_attention import (
    paged_decode_attention,
    paged_prefill_attention,
)


def init_mla_cache(
    cfg: MLAConfig, num_pages: int, page_tokens: int, dtype=jnp.bfloat16,
    quantized: bool = False,
) -> PagedKVCache:
    """One pool of [c | k_rope] vectors with S_sub == 1 (K IS V — the
    kernels zero the V rope tail), so each page moves with ONE DMA.
    ``quantized``: int8 payload + per-token symmetric scales — the
    compressed+quantized cache is d_c + d_r BYTES per token."""
    shape = (
        cfg.num_layers, 1, num_pages + 1, page_tokens, cfg.cache_width
    )
    # DISTINCT placeholder arrays per leaf: sharing one buffer breaks
    # buffer donation in the engine's donated cache programs.
    return PagedKVCache(
        kv_pages=jnp.zeros(shape, jnp.int8 if quantized else dtype),
        k_scales=(
            jnp.zeros(
                (cfg.num_layers, 1, num_pages + 1, 1, page_tokens),
                jnp.float32,
            )
            if quantized else jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
        ),
        v_scales=jnp.zeros((1, 1, 1, 1, 1), jnp.float32),
        page_tokens=page_tokens,
        num_pages=num_pages,
        quantized=quantized,
    )


def _write_state(cache, li, pidx, off, state):
    """Scatter [T?, dc+dr] per-token states (quantizing if configured)."""
    if cache.quantized:
        from metal_flash_attention_plus_tpu.serving.kv_cache import (
            _quantize_tokens_sym,
        )

        q, scale = _quantize_tokens_sym(state)
        return _dc.replace(
            cache,
            kv_pages=cache.kv_pages.at[li, :, pidx, off, :].set(
                q[:, None]
            ),
            k_scales=cache.k_scales.at[li, :, pidx, 0, off].set(scale),
        )
    return _dc.replace(
        cache,
        kv_pages=cache.kv_pages.at[li, :, pidx, off, :].set(
            state[:, None].astype(cache.kv_pages.dtype)
        ),
    )


def _kv_scale_args(cache, li):
    if cache.quantized:
        return dict(
            k_scales=cache.k_scales[li], v_scales=cache.k_scales[li]
        )
    return {}


def _attn_scale(cfg: MLAConfig) -> float:
    return float(cfg.head_dim + cfg.rope_dim) ** -0.5


def _q_latent(layer, q, qr, cfg: MLAConfig) -> jnp.ndarray:
    """Absorb W_uk and append the rope part → [B, H, S, d_c + d_r]."""
    q_lat = jnp.einsum(
        "bhsd,hdc->bhsc",
        q.astype(jnp.float32),
        layer["w_uk"].astype(jnp.float32),
        precision="highest",
    )
    return jnp.concatenate([q_lat, qr.astype(jnp.float32)], axis=-1)


def mla_prefill_chunk(
    params,
    tokens: jnp.ndarray,  # [C]
    offset: jnp.ndarray,  # scalar
    last_index: jnp.ndarray,  # scalar
    cache: PagedKVCache,
    page_row: jnp.ndarray,
    cfg: MLAConfig,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    c = tokens.shape[0]
    positions = offset + jnp.arange(c)
    x = params["embed"][tokens][None]  # [1, C, D]
    pos2d = positions[None]
    for li, layer in enumerate(params["layers"]):
        hn = rms_norm(x, layer["ln1"])
        q, qr = mla_layer_q(layer, hn, pos2d, cfg)
        c_kv, k_rope = mla_layer_kv(layer, hn, pos2d, cfg)
        state = jnp.concatenate(
            [c_kv, k_rope], axis=-1
        )[0]  # [C, dc+dr]
        t = jnp.arange(c)
        pidx = page_row[(offset + t) // cache.page_tokens]
        off_in = (offset + t) % cache.page_tokens
        cache = _write_state(cache, li, pidx, off_in, state)
        q_lat = _q_latent(layer, q, qr, cfg)[0].astype(x.dtype)
        o_lat = paged_prefill_attention(
            q_lat, cache.kv_pages[li], page_row, offset,
            page_tokens=cache.page_tokens,
            scale=_attn_scale(cfg), v_tail_zero=cfg.rope_dim,
            **_kv_scale_args(cache, li),
        )  # [H, C, dc+dr]
        o = jnp.einsum(
            "hsc,hcd->hsd",
            o_lat[..., : cfg.latent_dim].astype(jnp.float32),
            layer["w_uv"].astype(jnp.float32),
            precision="highest",
        )  # [H, C, dh]
        attn = o.transpose(1, 0, 2).reshape(1, c, -1).astype(x.dtype)
        x = x + linear(attn, layer["wo"], x.dtype)
        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu(linear(h2, layer["wg"], jnp.float32)) * linear(
            h2, layer["wu"], jnp.float32
        )
        x = x + linear(y.astype(x.dtype), layer["wd"], x.dtype)
    h_last = rms_norm(x[0, last_index][None, None], params["ln_f"])
    return linear(h_last, params["unembed"], jnp.float32)[0, 0], cache


def mla_decode_step(
    params,
    tokens: jnp.ndarray,  # [B]
    lengths: jnp.ndarray,  # [B] incl. this token
    page_tables: jnp.ndarray,  # [B, max_pages]
    cache: PagedKVCache,
    cfg: MLAConfig,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    b = tokens.shape[0]
    positions = lengths - 1
    x = params["embed"][tokens][:, None]  # [B, 1, D]
    pos2d = positions[:, None]
    rows = jnp.arange(b)
    for li, layer in enumerate(params["layers"]):
        hn = rms_norm(x, layer["ln1"])
        q, qr = mla_layer_q(layer, hn, pos2d, cfg)  # [B,H,1,·]
        c_kv, k_rope = mla_layer_kv(layer, hn, pos2d, cfg)  # [B,1,·]
        state = jnp.concatenate([c_kv, k_rope], axis=-1)[:, 0]  # [B, dc+dr]
        pidx = page_tables[rows, positions // cache.page_tokens]
        off = positions % cache.page_tokens
        cache = _write_state(cache, li, pidx, off, state)
        q_lat = _q_latent(layer, q, qr, cfg)[:, :, 0].astype(x.dtype)
        o_lat = paged_decode_attention(
            q_lat, cache.kv_pages[li],
            page_tables, lengths,
            page_tokens=cache.page_tokens,
            scale=_attn_scale(cfg), v_tail_zero=cfg.rope_dim,
            **_kv_scale_args(cache, li),
        )  # [B, H, dc+dr]
        o = jnp.einsum(
            "bhc,hcd->bhd",
            o_lat[..., : cfg.latent_dim].astype(jnp.float32),
            layer["w_uv"].astype(jnp.float32),
            precision="highest",
        )
        attn = o.reshape(b, 1, -1).astype(x.dtype)
        x = x + linear(attn, layer["wo"], x.dtype)
        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu(linear(h2, layer["wg"], jnp.float32)) * linear(
            h2, layer["wu"], jnp.float32
        )
        x = x + linear(y.astype(x.dtype), layer["wd"], x.dtype)
    hf = rms_norm(x, params["ln_f"])
    return linear(hf, params["unembed"], jnp.float32)[:, 0], cache
