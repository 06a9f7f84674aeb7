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

INT4 mode (``bits=4``): K and V of the SAME token share one byte — K in
the low nibble (+8 offset), V as the SIGNED high nibble (value << 4; the
split layout of exp41 — arithmetic ``>> 4`` unpacks V in one VPU op)
([L, Hkv, NP+1, page_tokens, D]
int8, HALF the int8 pool's bytes and a QUARTER of bf16's — the
reference's "INT4 = 12.5% memory" headline,
``/root/reference/README.md:291-296``; dequantizing int4 load parity:
``GEMMHeaders.swift:740-808``).  This layout was chosen over packing
along D or along tokens because it keeps the lane dim at D (Mosaic can
DMA-slice the pool), keeps tokens in order (no permuted masks), needs no
read-modify-write (K and V of a token are always written together), and
ONE page DMA still covers both operands.  Scales stay per-token
symmetric (absmax/7) in the same row-vector pools as int8.
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
    # Payload width: 16 (float pool), 8 (int8 K/V halves), 4 (K-low/V-high
    # shared-byte nibbles).
    bits: int = dataclasses.field(default=16, metadata=dict(static=True))

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
        bits: int = None,
    ) -> "PagedKVCache":
        if bits is None:
            bits = 8 if quantized else 16
        quantized = bits != 16
        if bits not in (4, 8, 16):
            raise ValueError(f"bits must be 4, 8 or 16, got {bits}")
        # int4 packs K and V nibbles into ONE byte row per token: the
        # token axis is page_tokens (not 2·page_tokens).
        rows = page_tokens if bits == 4 else 2 * page_tokens
        shape = (num_layers, num_kv_heads, num_pages + 1, rows, head_dim)
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
                bits=bits,
            )
        # DISTINCT placeholder arrays: sharing one buffer across two
        # pytree leaves breaks buffer donation ("donate the same buffer
        # twice") in the engine's donated cache programs.
        return PagedKVCache(
            kv_pages=jnp.zeros(shape, dtype),
            k_scales=jnp.zeros((1, 1, 1, 1, 1), jnp.float32),
            v_scales=jnp.zeros((1, 1, 1, 1, 1), jnp.float32),
            page_tokens=page_tokens,
            num_pages=num_pages,
        )


def _quantize_tokens_sym(x: jnp.ndarray):
    """Symmetric per-token int8: x [..., D] → (q int8, scale [..., 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return q.astype(jnp.int8), scale


def _pack_tokens_kv4(k: jnp.ndarray, v: jnp.ndarray):
    """Symmetric per-token int4 K/V packed into ONE byte plane.

    k, v: [..., D] floats → (byte [..., D] int8 with K+8 in the low nibble
    and V as the SIGNED high nibble (value << 4), k_scale [..., 1],
    v_scale [..., 1]).  Scale = absmax/7 (the int4 analog of the int8
    absmax/127; the low-nibble +8 offset mirrors the reference's nibble
    convention, ``GEMMQuantization.swift`` int4 pack).

    The SPLIT high-nibble encoding (exp41) exists for the decode kernel:
    an arithmetic ``byte >> 4`` on the sign-extended byte recovers the
    signed V payload in ONE VPU op (no mask, no offset), so only the K
    half pays the mask+sub — measured 1.14× over the symmetric
    offset-offset layout in the decode-shaped unpack microbench."""

    def q4(x):
        absmax = jnp.max(
            jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True
        )
        scale = jnp.maximum(absmax, 1e-12) / 7.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7)
        return q.astype(jnp.int32), scale

    kq, ks = q4(k)
    vq, vs = q4(v)
    byte = ((kq + 8) | (vq << 4)).astype(jnp.int8)
    return byte, ks, vs


def unpack_kv4(byte: jnp.ndarray):
    """Inverse of the :func:`_pack_tokens_kv4` byte plane → (k4, v4) int32
    in [-8, 7].  K: sign-extension of the int8 bytes is masked off (&0xF)
    exactly like ``ops.quantized_gemm.unpack_int4_tile``; V: one
    arithmetic shift on the sign-extended byte (split layout, exp41)."""
    wide = byte.astype(jnp.int32)
    return (wide & 0xF) - 8, wide >> 4


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
    if cache.bits == 4:
        byte, ks, vs = _pack_tokens_kv4(kt, vt)
        return dataclasses.replace(
            cache,
            kv_pages=cache.kv_pages.at[layer, :, pidx, off, :].set(byte),
            k_scales=cache.k_scales.at[layer, :, pidx, 0, off].set(
                ks[:, :, 0]
            ),
            v_scales=cache.v_scales.at[layer, :, pidx, 0, off].set(
                vs[:, :, 0]
            ),
        )
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
    if cache.bits == 4:
        byte, ks, vs = _pack_tokens_kv4(k, v)
        return dataclasses.replace(
            cache,
            kv_pages=cache.kv_pages.at[layer, :, pidx, off, :].set(byte),
            k_scales=cache.k_scales.at[layer, :, pidx, 0, off].set(
                ks[:, :, 0]
            ),
            v_scales=cache.v_scales.at[layer, :, pidx, 0, off].set(
                vs[:, :, 0]
            ),
        )
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
    if cache.bits == 4:
        byte = cache.kv_pages[layer][:, pidx, off, :]
        k4, v4 = unpack_kv4(byte)
        ks = cache.k_scales[layer][:, pidx, 0, off]  # [Hkv, L]
        vs = cache.v_scales[layer][:, pidx, 0, off]
        return (
            k4.astype(jnp.float32) * ks[..., None],
            v4.astype(jnp.float32) * vs[..., None],
        )
    k = cache.kv_pages[layer][:, pidx, off, :]
    v = cache.kv_pages[layer][:, pidx, cache.page_tokens + off, :]
    if cache.quantized:
        # [Hkv, L]: the scalar 2nd-axis index is itself an advanced index,
        # so (pidx, 0, off) broadcast together IN PLACE (consecutive
        # advanced indices do not move to the front).
        ks = cache.k_scales[layer][:, pidx, 0, off]
        vs = cache.v_scales[layer][:, pidx, 0, off]
        return (
            k.astype(jnp.float32) * ks[..., None],
            v.astype(jnp.float32) * vs[..., None],
        )
    return k, v
