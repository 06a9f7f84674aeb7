"""KV-cached transformer execution: prefill into pages + paged decode.

The serving-side twin of ``models/transformer.py`` (same parameters, same
math, numerically interchangeable — tests/test_serving.py pins decode
logits against the uncached forward).  Prefill runs the normal causal flash
kernel and scatters K/V into the paged cache; decode runs one token per
sequence through :func:`serving.paged_attention.paged_decode_attention`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    _merge_heads,
    _split_heads,
    linear,
    rms_norm,
    rope,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_plus_tpu.serving.kv_cache import (
    PagedKVCache,
    append_tokens,
    write_prompt,
)
from metal_flash_attention_plus_tpu.serving.paged_attention import (
    paged_decode_attention,
    paged_prefill_attention,
)


def init_cache(
    cfg: TransformerConfig,
    num_pages: int,
    page_tokens: int,
    dtype=jnp.bfloat16,
    quantized=False,
) -> PagedKVCache:
    """``quantized``: False → float pool; True or 8 → int8 halves;
    4 → shared-byte int4 (K low nibble / V high nibble)."""
    bits = {False: 16, True: 8, 8: 8, 4: 4}[quantized]
    return PagedKVCache.create(
        cfg.num_layers, cfg.num_kv_heads, num_pages, page_tokens,
        cfg.head_dim, dtype, quantized=bits != 16, bits=bits,
    )


def prefill(
    params,
    tokens: jnp.ndarray,  # [L] one sequence's prompt
    cache: PagedKVCache,
    page_row: jnp.ndarray,  # [max_pages]
    cfg: TransformerConfig,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """Run the prompt, fill the cache → (last-position logits [V], cache)."""
    seq = tokens.shape[0]
    positions = jnp.arange(seq)
    x = params["embed"][tokens][None]  # [1, L, D]
    hd = cfg.head_dim
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln1"])
        q = _split_heads(linear(h, layer["wq"]), cfg.num_heads, hd)
        k = _split_heads(linear(h, layer["wk"]), cfg.num_kv_heads, hd)
        v = _split_heads(linear(h, layer["wv"]), cfg.num_kv_heads, hd)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        cache = write_prompt(cache, li, k[0], v[0], page_row)
        o = flash_attention(q, k, v, mask=CAUSAL, block_sizes=cfg.block_sizes)
        x = x + linear(_merge_heads(o.astype(x.dtype)), layer["wo"], x.dtype)
        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu(linear(h2, layer["wg"], jnp.float32)) * linear(
            h2, layer["wu"], jnp.float32
        )
        x = x + linear(y.astype(x.dtype), layer["wd"], x.dtype)
    hf = rms_norm(x[:, -1:], params["ln_f"])
    logits = linear(hf, params["unembed"], jnp.float32)
    return logits[0, 0], cache


def prefill_chunk(
    params,
    tokens: jnp.ndarray,  # [C] one chunk of one sequence's prompt
    offset: jnp.ndarray,  # scalar int32: chunk's first global position
    last_index: jnp.ndarray,  # scalar int32: row whose logits to return
    cache: PagedKVCache,
    page_row: jnp.ndarray,  # [max_pages]
    cfg: TransformerConfig,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """Chunked prefill: attend to the cached prefix + this chunk's causal
    triangle via the paged-prefill kernel → (logits[last_index] [V], cache).

    The chunk size is static (jit once per size); the engine pads chunks to
    its budget — pad rows write KV into positions past the sequence end
    (unreserved page slots map to the trash page) and their outputs are
    ignored via ``last_index``.
    """
    c = tokens.shape[0]
    positions = offset + jnp.arange(c)
    x = params["embed"][tokens][None]  # [1, C, D]
    hd = cfg.head_dim
    pos2d = positions[None]  # [1, C]
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln1"])
        q = _split_heads(linear(h, layer["wq"]), cfg.num_heads, hd)
        k = _split_heads(linear(h, layer["wk"]), cfg.num_kv_heads, hd)
        v = _split_heads(linear(h, layer["wv"]), cfg.num_kv_heads, hd)
        q = rope(q, pos2d, cfg.rope_theta)
        k = rope(k, pos2d, cfg.rope_theta)
        # Scatter this chunk's KV, then attend over prefix + chunk.
        import dataclasses as _dc

        from metal_flash_attention_plus_tpu.serving.kv_cache import (
            _quantize_tokens_sym,
        )

        t = jnp.arange(c)
        pidx = page_row[(offset + t) // cache.page_tokens]
        off_in = (offset + t) % cache.page_tokens
        kt = k[0].transpose(1, 0, 2)
        vt = v[0].transpose(1, 0, 2)
        if cache.bits == 4:
            from metal_flash_attention_plus_tpu.serving.kv_cache import (
                _pack_tokens_kv4,
            )

            byte_, ks_, vs_ = _pack_tokens_kv4(kt, vt)
            cache = _dc.replace(
                cache,
                kv_pages=cache.kv_pages.at[li, :, pidx, off_in, :].set(
                    byte_
                ),
                k_scales=cache.k_scales.at[li, :, pidx, 0, off_in].set(
                    ks_[:, :, 0]
                ),
                v_scales=cache.v_scales.at[li, :, pidx, 0, off_in].set(
                    vs_[:, :, 0]
                ),
            )
            o = paged_prefill_attention(
                q[0], cache.kv_pages[li], page_row, offset,
                page_tokens=cache.page_tokens,
                k_scales=cache.k_scales[li], v_scales=cache.v_scales[li],
                kv_bits=4,
            )
        elif cache.quantized:
            kq_, ks_ = _quantize_tokens_sym(kt)
            vq_, vs_ = _quantize_tokens_sym(vt)
            cache = _dc.replace(
                cache,
                kv_pages=cache.kv_pages
                .at[li, :, pidx, off_in, :].set(kq_)
                .at[li, :, pidx, cache.page_tokens + off_in, :].set(vq_),
                k_scales=cache.k_scales.at[li, :, pidx, 0, off_in].set(
                    ks_[:, :, 0]
                ),
                v_scales=cache.v_scales.at[li, :, pidx, 0, off_in].set(
                    vs_[:, :, 0]
                ),
            )
            o = paged_prefill_attention(
                q[0], cache.kv_pages[li], page_row, offset,
                page_tokens=cache.page_tokens,
                k_scales=cache.k_scales[li], v_scales=cache.v_scales[li],
            )
        else:
            cache = _dc.replace(
                cache,
                kv_pages=cache.kv_pages
                .at[li, :, pidx, off_in, :].set(
                    kt.astype(cache.kv_pages.dtype)
                )
                .at[li, :, pidx, cache.page_tokens + off_in, :].set(
                    vt.astype(cache.kv_pages.dtype)
                ),
            )
            o = paged_prefill_attention(
                q[0], cache.kv_pages[li], page_row, offset,
                page_tokens=cache.page_tokens,
            )  # [Hq, C, D]
        attn = o.transpose(1, 0, 2).reshape(1, c, -1).astype(x.dtype)
        x = x + linear(attn, layer["wo"], x.dtype)
        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu(linear(h2, layer["wg"], jnp.float32)) * linear(
            h2, layer["wu"], jnp.float32
        )
        x = x + linear(y.astype(x.dtype), layer["wd"], x.dtype)
    h_last = rms_norm(x[0, last_index][None, None], params["ln_f"])
    logits = linear(h_last, params["unembed"], jnp.float32)
    return logits[0, 0], cache


def decode_step(
    params,
    tokens: jnp.ndarray,  # [B] the just-sampled token per sequence
    lengths: jnp.ndarray,  # [B] length INCLUDING this token
    page_tables: jnp.ndarray,  # [B, max_pages]
    cache: PagedKVCache,
    cfg: TransformerConfig,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """One decode step for a batch of sequences → (logits [B, V], cache)."""
    positions = lengths - 1  # this token's index
    x = params["embed"][tokens][:, None]  # [B, 1, D]
    hd = cfg.head_dim
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln1"])
        q = _split_heads(linear(h, layer["wq"]), cfg.num_heads, hd)  # [B, Hq, 1, D]
        k = _split_heads(linear(h, layer["wk"]), cfg.num_kv_heads, hd)
        v = _split_heads(linear(h, layer["wv"]), cfg.num_kv_heads, hd)
        pos2d = positions[:, None]  # [B, 1] — per-sequence RoPE position
        q = rope(q, pos2d, cfg.rope_theta)
        k = rope(k, pos2d, cfg.rope_theta)
        cache = append_tokens(
            cache, li, k[:, :, 0], v[:, :, 0], positions, page_tables
        )
        o = paged_decode_attention(
            q[:, :, 0],  # [B, Hq, D]
            cache.kv_pages[li],
            page_tables,
            lengths,
            page_tokens=cache.page_tokens,
            k_scales=cache.k_scales[li] if cache.quantized else None,
            v_scales=cache.v_scales[li] if cache.quantized else None,
            kv_bits=cache.bits if cache.quantized else 8,
        )
        x = x + linear(
            o[:, None, :, :].reshape(x.shape[0], 1, -1), layer["wo"], x.dtype
        )
        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu(linear(h2, layer["wg"], jnp.float32)) * linear(
            h2, layer["wu"], jnp.float32
        )
        x = x + linear(y.astype(x.dtype), layer["wd"], x.dtype)
    hf = rms_norm(x, params["ln_f"])
    logits = linear(hf, params["unembed"], jnp.float32)
    return logits[:, 0], cache
