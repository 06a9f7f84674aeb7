"""Ring attention — context parallelism over ``ppermute``'d KV blocks.

New scope vs the reference (SURVEY.md §5 "Long-context / sequence
parallelism"): the reference scales sequence length only via flash blocking
on one device.  Here the *same* online-softmax merge the reference performs
per KV tile (``AttentionKernel+Softmax.swift:640-701`` — m/l tracking +
O rescale) is lifted across devices: each device owns one sequence chunk of
Q/K/V; KV chunks rotate around the ``context`` mesh axis, and per-step
partial (O, L) outputs are merged with the log-sum-exp combine

    M' = max(M, l_s);  O' = O·e^{M−M'} + o_s·e^{l_s−M'};  W' = W·e^{M−M'} + e^{l_s−M'}

Backward follows the reference's atomic-free two-kernel factoring
(``README.md:89-94``): with the *globally merged* (O, L) as residuals, the
per-chunk backward kernels are exactly correct partials — dQ sums over KV
ring steps on the Q-owning device; dK/dV partials travel *with* their KV
chunk around the ring and arrive home fully reduced.

Causal scheduling: at step ``s`` device ``i`` holds KV chunk ``(i−s) mod N``.
Chunks with index > i are fully masked (skipped via a zero-cost branch),
index == i is the causal diagonal, index < i is dense.  This is the plain
ring; the known causal load imbalance (early devices idle on late steps) is
documented in docs/parallel.md — a zigzag chunk permutation is the follow-up.

All functions are designed to be called INSIDE ``shard_map`` with
sequence-sharded operands.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    BlockSizes,
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
    flash_attention_backward,
)

NEG_INF = -jnp.inf


def _safe_exp(a, b):
    """exp(a - b) with exp(-inf - -inf) := 0 (empty-accumulator guard)."""
    return jnp.where(jnp.isneginf(a), 0.0, jnp.exp(a - b))


def _merge(acc, m, w, o_s, l_s):
    """Online-softmax merge of a new partial (o_s, l_s) into (acc, m, w)."""
    m_new = jnp.maximum(m, l_s)
    c_prev = _safe_exp(m, m_new)
    c_new = _safe_exp(l_s, m_new)
    acc = acc * c_prev[..., None] + o_s * c_new[..., None]
    w = w * c_prev + c_new
    return acc, m_new, w


EMPTY, DIAG, DENSE = 0, 1, 2


def _step_kind(kv_idx, my_idx, causal: bool):
    if not causal:
        return jnp.full_like(kv_idx, DENSE)
    return jnp.where(
        kv_idx > my_idx, EMPTY, jnp.where(kv_idx == my_idx, DIAG, DENSE)
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "context",
    causal: bool = True,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
) -> jnp.ndarray:
    """Context-parallel flash attention (call inside shard_map).

    Args:
      q: local [B, Hq, S_local, D] chunk (chunk i on context-axis device i).
      k, v: local [B, Hkv, S_local, D] chunks.
      axis_name: the context mesh axis.
      causal: causal masking in *global* sequence coordinates.

    Returns:
      Local O chunk [B, Hq, S_local, D], dtype of q.
    """
    o, _l = _ring_forward(
        q, k, v, axis_name, causal, scale, block_sizes, interleaved_kv
    )
    return o.astype(q.dtype)


def _ring_forward(
    q, k, v, axis_name, causal, scale, block_sizes, interleaved_kv
):
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    b, hq, s_loc, d = q.shape

    def run(mask):
        def f(q_, k_, v_):
            return flash_attention_forward(
                q_, k_, v_,
                mask=mask, scale=scale, block_sizes=block_sizes,
                interleaved_kv=interleaved_kv, out_dtype=jnp.float32,
            )

        return f

    dense_fn = run(FULL)
    diag_fn = run(CAUSAL)

    def empty_fn(q_, k_, v_):
        return (
            jnp.zeros((b, hq, s_loc, d), jnp.float32),
            jnp.full((b, hq, s_loc), NEG_INF, jnp.float32),
        )

    def body(s, carry):
        acc, m, w, k_cur, v_cur = carry
        kv_idx = (my - s) % n
        kind = _step_kind(kv_idx, my, causal)
        o_s, l_s = jax.lax.switch(
            kind, [empty_fn, diag_fn, dense_fn], q, k_cur, v_cur
        )
        acc, m, w = _merge(acc, m, w, o_s, l_s)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return acc, m, w, k_next, v_next

    init = (
        jnp.zeros((b, hq, s_loc, d), jnp.float32),
        jnp.full((b, hq, s_loc), NEG_INF, jnp.float32),
        jnp.zeros((b, hq, s_loc), jnp.float32),
        k,
        v,
    )
    acc, m, w, _, _ = jax.lax.fori_loop(0, n, body, init)
    w_safe = jnp.maximum(w, jnp.finfo(jnp.float32).tiny)
    o = acc / w_safe[..., None]
    l = jnp.where(w > 0, m + jnp.log(w_safe), NEG_INF)
    return o, l


def _ring_fwd(
    q, k, v, axis_name, causal, scale, block_sizes, interleaved_kv
):
    o, l = _ring_forward(
        q, k, v, axis_name, causal, scale, block_sizes, interleaved_kv
    )
    return o.astype(q.dtype), (q, k, v, o, l)


def _ring_bwd(
    axis_name, causal, scale, block_sizes, interleaved_kv, res, do
):
    q, k, v, o, l = res
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    # D = rowsum(dO ⊙ O) depends only on (o, do) — hoist it out of the ring
    # loop instead of recomputing per step (one pass instead of N_devices).
    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    def run(mask):
        def f(q_, k_, v_):
            dq_, dk_, dv_, _ = flash_attention_backward(
                q_, k_, v_, o, l, do,
                mask=mask, scale=scale, block_sizes=block_sizes,
                interleaved_kv=interleaved_kv, di=di,
            )
            return dq_, dk_, dv_

        return f

    dense_fn = run(FULL)
    diag_fn = run(CAUSAL)

    def empty_fn(q_, k_, v_):
        return (
            jnp.zeros(q.shape, jnp.float32),
            jnp.zeros(k.shape, jnp.float32),
            jnp.zeros(v.shape, jnp.float32),
        )

    def body(s, carry):
        dq_acc, dk_acc, dv_acc, k_cur, v_cur = carry
        kv_idx = (my - s) % n
        kind = _step_kind(kv_idx, my, causal)
        dq_s, dk_s, dv_s = jax.lax.switch(
            kind, [empty_fn, diag_fn, dense_fn], q, k_cur, v_cur
        )
        dq_acc = dq_acc + dq_s
        # dK/dV partials travel with their chunk (rotated every step, so
        # after n rotations each chunk's gradient arrives fully reduced at
        # the chunk's home device).
        dk_acc = jax.lax.ppermute(dk_acc + dk_s, axis_name, perm)
        dv_acc = jax.lax.ppermute(dv_acc + dv_s, axis_name, perm)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return dq_acc, dk_acc, dv_acc, k_next, v_next

    init = (
        jnp.zeros(q.shape, jnp.float32),
        jnp.zeros(k.shape, jnp.float32),
        jnp.zeros(v.shape, jnp.float32),
        k,
        v,
    )
    dq, dk, dv, _, _ = jax.lax.fori_loop(0, n, body, init)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention.defvjp(_ring_fwd, _ring_bwd)


# ---------------------------------------------------------------------------
# Zigzag ring: causal load balancing.
# ---------------------------------------------------------------------------
#
# Plain causal rings idle early devices on late steps (device i does i+1 of
# N steps' work → worst/best = N×).  The zigzag layout gives device i TWO
# sequence chunks — chunk i and chunk 2N−1−i of 2N — so each device's live
# work per rotation is near-constant.  Per step, the 2×2 (q-sub, kv-sub)
# chunk pairs each resolve to dense/diagonal/empty independently and merge
# into per-sub online-softmax accumulators.


def zigzag_order(num_devices: int):
    """Chunk permutation putting (i, 2N−1−i) adjacent for device i."""
    n = num_devices
    order = []
    for i in range(n):
        order += [i, 2 * n - 1 - i]
    return order


def zigzag_inverse(num_devices: int):
    order = zigzag_order(num_devices)
    inv = [0] * len(order)
    for pos, c in enumerate(order):
        inv[c] = pos
    return inv


def _zz_apply(x, perm, seq_axis: int):
    n2 = len(perm)
    s = x.shape[seq_axis]
    c = s // n2
    parts = jnp.split(x, n2, axis=seq_axis)
    return jnp.concatenate([parts[p] for p in perm], axis=seq_axis)


def zigzag_preshard(x: jnp.ndarray, num_devices: int, seq_axis: int = 2):
    """Global [.., S, ..] → zigzag chunk order (feed to shard_map P-split)."""
    return _zz_apply(x, zigzag_order(num_devices), seq_axis)


def zigzag_postshard(x: jnp.ndarray, num_devices: int, seq_axis: int = 2):
    """Invert :func:`zigzag_preshard` on gathered outputs."""
    return _zz_apply(x, zigzag_inverse(num_devices), seq_axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ring_attention_zigzag(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "context",
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interleaved_kv: bool = False,
) -> jnp.ndarray:
    """Causal context-parallel attention, zigzag-balanced (inside shard_map).

    Local operands hold chunks (i, 2N−1−i) CONCATENATED along the sequence
    axis (use :func:`zigzag_preshard` on the global arrays first).
    Returns the local O in the same zigzag layout.
    """
    o, _ = _zz_forward(q, k, v, axis_name, scale, block_sizes, interleaved_kv)
    return o.astype(q.dtype)


def _zz_chunk_kind(qc, kc):
    return jnp.where(kc > qc, EMPTY, jnp.where(kc == qc, DIAG, DENSE))


def _zz_forward(q, k, v, axis_name, scale, block_sizes, interleaved_kv):
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    b, hq, s2, d = q.shape
    c = s2 // 2  # per-chunk rows

    def run(mask):
        def f(q_, k_, v_):
            return flash_attention_forward(
                q_, k_, v_, mask=mask, scale=scale, block_sizes=block_sizes,
                interleaved_kv=interleaved_kv, out_dtype=jnp.float32,
            )

        return f

    dense_fn = run(FULL)
    diag_fn = run(CAUSAL)

    def empty_fn(q_, k_, v_):
        return (
            jnp.zeros(q_.shape, jnp.float32),
            jnp.full(q_.shape[:3], NEG_INF, jnp.float32),
        )

    q_subs = (q[:, :, :c], q[:, :, c:])

    def body(s, carry):
        accs, ms, ws, k_cur, v_cur = carry
        j = (my - s) % n
        kv_chunks = (j, 2 * n - 1 - j)
        q_chunks_g = (my, 2 * n - 1 - my)
        new_accs, new_ms, new_ws = [], [], []
        for qi in range(2):
            acc, m, w = accs[qi], ms[qi], ws[qi]
            for ki in range(2):
                kind = _zz_chunk_kind(q_chunks_g[qi], kv_chunks[ki])
                k_sub = k_cur[:, :, ki * c : (ki + 1) * c]
                v_sub = v_cur[:, :, ki * c : (ki + 1) * c]
                o_s, l_s = jax.lax.switch(
                    kind, [empty_fn, diag_fn, dense_fn],
                    q_subs[qi], k_sub, v_sub,
                )
                acc, m, w = _merge(acc, m, w, o_s, l_s)
            new_accs.append(acc)
            new_ms.append(m)
            new_ws.append(w)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return tuple(new_accs), tuple(new_ms), tuple(new_ws), k_next, v_next

    zero_acc = jnp.zeros((b, hq, c, d), jnp.float32)
    zero_m = jnp.full((b, hq, c), NEG_INF, jnp.float32)
    zero_w = jnp.zeros((b, hq, c), jnp.float32)
    init = (
        (zero_acc, zero_acc), (zero_m, zero_m), (zero_w, zero_w), k, v,
    )
    accs, ms, ws, _, _ = jax.lax.fori_loop(0, n, body, init)

    outs, ls = [], []
    for qi in range(2):
        w_safe = jnp.maximum(ws[qi], jnp.finfo(jnp.float32).tiny)
        outs.append(accs[qi] / w_safe[..., None])
        ls.append(jnp.where(ws[qi] > 0, ms[qi] + jnp.log(w_safe), NEG_INF))
    return (
        jnp.concatenate(outs, axis=2),
        jnp.concatenate(ls, axis=2),
    )


def _zz_fwd(q, k, v, axis_name, scale, block_sizes, interleaved_kv):
    o, l = _zz_forward(q, k, v, axis_name, scale, block_sizes, interleaved_kv)
    return o.astype(q.dtype), (q, k, v, o, l)


def _zz_bwd(axis_name, scale, block_sizes, interleaved_kv, res, do):
    q, k, v, o, l = res
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    c = q.shape[2] // 2
    # Hoist D = rowsum(dO ⊙ O) out of the ring loop (per-sub slices below).
    di_full = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    def run(mask, q_, k_, v_, o_, l_, do_, di_):
        dq_, dk_, dv_, _ = flash_attention_backward(
            q_, k_, v_, o_, l_, do_,
            mask=mask, scale=scale, block_sizes=block_sizes,
            interleaved_kv=interleaved_kv, di=di_,
        )
        return dq_, dk_, dv_

    def dense_fn(args):
        return run(FULL, *args)

    def diag_fn(args):
        return run(CAUSAL, *args)

    def empty_fn(args):
        q_, k_, v_ = args[0], args[1], args[2]
        return (
            jnp.zeros(q_.shape, jnp.float32),
            jnp.zeros(k_.shape, jnp.float32),
            jnp.zeros(v_.shape, jnp.float32),
        )

    q_subs = (q[:, :, :c], q[:, :, c:])
    o_subs = (o[:, :, :c], o[:, :, c:])
    l_subs = (l[:, :, :c], l[:, :, c:])
    do_subs = (do[:, :, :c], do[:, :, c:])
    di_subs = (di_full[:, :, :c], di_full[:, :, c:])

    def body(s, carry):
        dq_acc, dkv_acc, k_cur, v_cur = carry
        j = (my - s) % n
        kv_chunks = (j, 2 * n - 1 - j)
        q_chunks_g = (my, 2 * n - 1 - my)
        for qi in range(2):
            for ki in range(2):
                kind = _zz_chunk_kind(q_chunks_g[qi], kv_chunks[ki])
                k_sub = k_cur[:, :, ki * c : (ki + 1) * c]
                v_sub = v_cur[:, :, ki * c : (ki + 1) * c]
                dq_s, dk_s, dv_s = jax.lax.switch(
                    kind, [empty_fn, diag_fn, dense_fn],
                    (
                        q_subs[qi], k_sub, v_sub,
                        o_subs[qi], l_subs[qi], do_subs[qi], di_subs[qi],
                    ),
                )
                dq_acc = dq_acc.at[:, :, qi * c : (qi + 1) * c].add(dq_s)
                dkv_acc = dkv_acc.at[:, :, ki * c : (ki + 1) * c].add(dk_s)
                dkv_acc = dkv_acc.at[
                    :, :, 2 * c + ki * c : 2 * c + (ki + 1) * c
                ].add(dv_s)
        # dK/dV partials travel with their chunk pair.
        dkv_next = jax.lax.ppermute(dkv_acc, axis_name, perm)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return dq_acc, dkv_next, k_next, v_next

    dkv0 = jnp.zeros(
        (k.shape[0], k.shape[1], 4 * c, k.shape[3]), jnp.float32
    )  # [dk(2c) | dv(2c)] stacked along seq
    init = (jnp.zeros(q.shape, jnp.float32), dkv0, k, v)
    dq, dkv, _, _ = jax.lax.fori_loop(0, n, body, init)
    dk = dkv[:, :, : 2 * c]
    dv = dkv[:, :, 2 * c :]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention_zigzag.defvjp(_zz_fwd, _zz_bwd)
