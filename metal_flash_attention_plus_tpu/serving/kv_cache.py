"""Paged KV cache — device-side page pools behind the native allocator.

The C++ ``PagePool`` (cpp/mfa_runtime.cc) owns page *accounting* (which
physical page belongs to which sequence); this module owns the page
*storage*: one [L, Hkv, num_pages+1, page_tokens, D] array pair per model,
plus the scatter ops that write prompt / decode-token KV into pages.  The
extra last page is the TRASH page: padded batch slots in the jitted decode
step point their page tables at it so dummy writes never corrupt live data.

Quantized mode (``quantized=True``): pages store int8 payloads with
SYMMETRIC per-token scales in parallel scale pools laid out as ROW
VECTORS ([..., 1, page_tokens] fp32 — scales ride the LANE dim so the
decode kernel's page-gather DMA can copy them, and the kernels fold them
into the score/probability row instead of dequantizing whole K/V tiles:
one [rows, tokens] multiply instead of a [tokens, D] pass).  2-4× cache
capacity per HBM byte; zero points add nothing for zero-mean K/V.
Quantization happens at WRITE time (absmax/127 per token vector).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    # MERGED page pool [L, Hkv, num_pages+1, 2·page_tokens, D]: K tokens
    # in rows [0, PT), V tokens in rows [PT, 2PT) — ONE DMA per page
    # covers both operands (the page-gather is issue-bound, ~0.25 µs per
    # copy regardless of bytes — docs/perf_notes.md round-2 — so copy
    # COUNT is the currency).  MLA's latent cache stores ONE state per
    # token (rows = PT; K is V).  The pair rides the TOKEN axis (not its
    # own dim) so the DMA slice keeps plain 2D minor dims — Mosaic cannot
    # slice tiled 5D pools at D < 128.
    kv_pages: jnp.ndarray
    # Per-token symmetric scales (quantized mode only; zeros-shaped [1]*5
    # placeholders otherwise so the pytree structure is stable).
    k_scales: jnp.ndarray
    v_scales: jnp.ndarray
    page_tokens: int = dataclasses.field(metadata=dict(static=True))
    num_pages: int = dataclasses.field(metadata=dict(static=True))
    quantized: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def trash_page(self) -> int:
        return self.num_pages  # the extra page

    @staticmethod
    def create(
        num_layers: int,
        num_kv_heads: int,
        num_pages: int,
        page_tokens: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "PagedKVCache":
        shape = (
            num_layers, num_kv_heads, num_pages + 1, 2 * page_tokens,
            head_dim,
        )
        if quantized:
            sshape = (num_layers, num_kv_heads, num_pages + 1, 1,
                      page_tokens)
            return PagedKVCache(
                kv_pages=jnp.zeros(shape, jnp.int8),
                k_scales=jnp.zeros(sshape, jnp.float32),
                v_scales=jnp.zeros(sshape, jnp.float32),
                page_tokens=page_tokens,
                num_pages=num_pages,
                quantized=True,
            )
        placeholder = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
        return PagedKVCache(
            kv_pages=jnp.zeros(shape, dtype),
            k_scales=placeholder,
            v_scales=placeholder,
            page_tokens=page_tokens,
            num_pages=num_pages,
        )


def _quantize_tokens_sym(x: jnp.ndarray):
    """Symmetric per-token int8: x [..., D] → (q int8, scale [..., 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return q.astype(jnp.int8), scale


def write_prompt(
    cache: PagedKVCache,
    layer: int,
    k: jnp.ndarray,  # [Hkv, L, D]
    v: jnp.ndarray,
    page_row: jnp.ndarray,  # [max_pages] physical ids for this sequence
) -> PagedKVCache:
    """Scatter a full prompt's KV into the sequence's pages."""
    seq_len = k.shape[1]
    t = jnp.arange(seq_len)
    pidx = page_row[t // cache.page_tokens]
    off = t % cache.page_tokens
    # Advanced indices separated by the head slice land in front: the
    # selected shape is [L, Hkv, D], so feed token-major values.
    kt = k.transpose(1, 0, 2)
    vt = v.transpose(1, 0, 2)
    if cache.quantized:
        kq, ks = _quantize_tokens_sym(kt)
        vq, vs = _quantize_tokens_sym(vt)
        return dataclasses.replace(
            cache,
            kv_pages=cache.kv_pages.at[layer, :, pidx, off, :].set(kq)
            .at[layer, :, pidx, cache.page_tokens + off, :].set(vq),
            k_scales=cache.k_scales.at[layer, :, pidx, 0, off].set(
                ks[:, :, 0]
            ),
            v_scales=cache.v_scales.at[layer, :, pidx, 0, off].set(
                vs[:, :, 0]
            ),
        )
    kv_pages = cache.kv_pages.at[layer, :, pidx, off, :].set(
        kt.astype(cache.kv_pages.dtype)
    ).at[layer, :, pidx, cache.page_tokens + off, :].set(
        vt.astype(cache.kv_pages.dtype)
    )
    return dataclasses.replace(cache, kv_pages=kv_pages)


def append_tokens(
    cache: PagedKVCache,
    layer: int,
    k: jnp.ndarray,  # [B, Hkv, D] — the new token per sequence
    v: jnp.ndarray,
    positions: jnp.ndarray,  # [B] token index being written (0-based)
    page_tables: jnp.ndarray,  # [B, max_pages]
) -> PagedKVCache:
    """Batched single-token append (decode step)."""
    b = k.shape[0]
    rows = jnp.arange(b)
    pidx = page_tables[rows, positions // cache.page_tokens]  # [B]
    off = positions % cache.page_tokens
    # Selected shape is [B, Hkv, D] (advanced indices land in front).
    if cache.quantized:
        kq, ks = _quantize_tokens_sym(k)
        vq, vs = _quantize_tokens_sym(v)
        return dataclasses.replace(
            cache,
            kv_pages=cache.kv_pages.at[layer, :, pidx, off, :].set(kq)
            .at[layer, :, pidx, cache.page_tokens + off, :].set(vq),
            k_scales=cache.k_scales.at[layer, :, pidx, 0, off].set(
                ks[:, :, 0]
            ),
            v_scales=cache.v_scales.at[layer, :, pidx, 0, off].set(
                vs[:, :, 0]
            ),
        )
    kv_pages = cache.kv_pages.at[layer, :, pidx, off, :].set(
        k.astype(cache.kv_pages.dtype)
    ).at[layer, :, pidx, cache.page_tokens + off, :].set(
        v.astype(cache.kv_pages.dtype)
    )
    return dataclasses.replace(cache, kv_pages=kv_pages)


def gather_kv(
    cache: PagedKVCache, layer: int, page_row: jnp.ndarray, seq_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Densify one sequence's KV ([Hkv, seq_len, D]) — test/debug helper."""
    t = jnp.arange(seq_len)
    pidx = page_row[t // cache.page_tokens]
    off = t % cache.page_tokens
    # [layer] is applied FIRST, so pidx/off are contiguous advanced indices
    # and stay in place: gathered shape is [Hkv, L, D] directly.  (In the
    # .at[layer, :, pidx, off, :] writes above, the integer layer index
    # makes the advanced indices non-contiguous, moving them to the front.)
    k = cache.kv_pages[layer][:, pidx, off, :]
    v = cache.kv_pages[layer][:, pidx, cache.page_tokens + off, :]
    if cache.quantized:
        ks = cache.k_scales[layer][:, pidx, 0, off]  # [L, Hkv] (adv front)
        vs = cache.v_scales[layer][:, pidx, 0, off]
        return (
            k.astype(jnp.float32) * ks.T[..., None],
            v.astype(jnp.float32) * vs.T[..., None],
        )
    return k, v
