"""d=64 head-packing (VERDICT r3 #4): the 128-deep MXU contraction is
half-empty at d=64 (exp28: dots-only floor 65.6 TF/s = 33% of peak), so
pack TWO heads per MXU pass:

  Q_cat  = [q_h1 | q_h2]                  [bq, 128]   (full depth)
  K_bd   = [[k_h1 | 0], [0 | k_h2]]       [2·bkv, 128] (block-diagonal)
  S      = Q_cat · K_bdᵀ                  [bq, 2·bkv]
           columns [0,bkv) are h1's scores, [bkv,2bkv) h2's — one
           full-depth dot replaces two half-depth ones.
  softmax per COLUMN-HALF (the row carries two heads' q).
  V_bd   = [[v_h1 | 0], [0 | v_h2]]       [2·bkv, 128]
  O_cat  = P_cat · V_bd                   [bq, 128] = [o_h1 | o_h2]
           (full output lanes; contraction 2·bkv).

The zeros are built IN-KERNEL from the two natural [bkv, 64] tiles (lane
concat with a zero tile), so HBM traffic stays at the real payload.
Folded int8 KV (mixed bf16×int8 dots), causal + FULL, S=4096 — the
bench d=64 arm's math.  Controls: the unpacked lean kernel (exp33) and
the production wrapper, within-run.

Usage: exp35_headpack_d64.py [h]
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from experiments.exp33_lean_landing import (  # noqa: E402
    build_lean, build_prod, slope,
)

S = 4096
D = 64
LANES = 128
LN2 = 0.6931471805599453
NEG_INF = -1e30


def hpack_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                 *, bq, bkv, n_inner, causal):
    # q_ref [1, 1, bq, 128]: lanes [0,64) head h1 = 2·hp, [64,128) h2.
    # k/v_ref [1, 2, bkvm, 64]: the pair's payload tiles.
    i = pl.program_id(2)
    j = pl.program_id(3)
    bkvm = bkv * n_inner
    nj = pl.num_programs(3)
    hi = (((i + 1) * bq) + bkvm - 1) // bkvm if causal else nj

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def inner(t, masked):
        sl = pl.ds(t * bkv, bkv)
        k1 = k_ref[0, 0, 0, sl, :]
        k2 = k_ref[0, 0, 1, sl, :]
        z8 = jnp.zeros((bkv, D), jnp.int8)
        k_bd = jnp.concatenate([
            jnp.concatenate([k1, z8], axis=1),
            jnp.concatenate([z8, k2], axis=1),
        ], axis=0)  # [2bkv, 128] int8 block-diagonal
        s = jax.lax.dot_general(
            q_ref[0, 0], k_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, 2bkv] — h1 cols [0,bkv), h2 cols [bkv,2bkv)
        if masked:
            c0 = (j * n_inner + t) * bkv
            col = jax.lax.broadcasted_iota(
                jnp.int32, (bq, 2 * bkv), 1) % bkv + c0
            row = (jax.lax.broadcasted_iota(jnp.int32, (bq, 2 * bkv), 0)
                   + i * bq)
            s = jnp.where(col <= row, s, NEG_INF)
        # Per-half softmax stats (each row holds TWO heads' scores).
        s1 = s[:, :bkv]
        s2 = s[:, bkv:]
        m_prev = m_scr[...]  # [bq, 128]: lanes [0,64) h1, [64,128) h2
        m_curr = jnp.concatenate([
            jnp.broadcast_to(jnp.max(s1, 1, keepdims=True), (bq, D)),
            jnp.broadcast_to(jnp.max(s2, 1, keepdims=True), (bq, D)),
        ], axis=1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)  # [bq, 128] two-head alpha
        mw = pltpu.repeat(m_next, bkv * 2 // LANES, axis=1)
        # repeat lays lane pattern [h1|h2|h1|h2…]; we need [h1…|h2…].
        # Simpler: subtract per half.
        m1w = pltpu.repeat(m_next[:, :D], bkv // D, axis=1)
        m2w = pltpu.repeat(m_next[:, D:], bkv // D, axis=1)
        del mw
        p = jnp.exp2(jnp.concatenate([s1 - m1w, s2 - m2w], axis=1))
        l_scr[...] = alpha * l_scr[...] + jnp.concatenate([
            jnp.broadcast_to(
                jnp.sum(p[:, :bkv], 1, keepdims=True), (bq, D)),
            jnp.broadcast_to(
                jnp.sum(p[:, bkv:], 1, keepdims=True), (bq, D)),
        ], axis=1)
        m_scr[...] = m_next
        v1 = v_ref[0, 0, 0, sl, :]
        v2 = v_ref[0, 0, 1, sl, :]
        v_bd = jnp.concatenate([
            jnp.concatenate([v1, z8], axis=1),
            jnp.concatenate([z8, v2], axis=1),
        ], axis=0)  # [2bkv, 128]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_bd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, 128] = [o_h1 | o_h2]
        acc_scr[...] = acc_scr[...] * alpha + pv

    if causal:
        fully_live = (j + 1) * bkvm <= i * bq + 1

        @pl.when(jnp.logical_and(j < hi, fully_live))
        def _interior():
            for t in range(n_inner):
                inner(t, False)

        @pl.when(jnp.logical_and(j < hi, jnp.logical_not(fully_live)))
        def _edge():
            for t in range(n_inner):
                inner(t, True)
    else:
        for t in range(n_inner):
            inner(t, False)

    @pl.when(j == hi - 1)
    def _store():
        lsum = l_scr[...]
        safe = jnp.where(lsum == 0.0, 1.0, lsum)
        o_ref[0, 0] = (acc_scr[...] / safe).astype(o_ref.dtype)


def build_hpack(h, b, bq, bkv, n_inner, causal):
    assert h % 2 == 0
    h2 = h // 2
    bkvm = bkv * n_inner
    ni, nj = S // bq, S // bkvm
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pre = (D ** -0.5) * 1.4426950408889634
    # Q pre-packed [b, h2, S, 128] (pair lanes), KV [b, h2, 2, S, 64].
    q = (jax.random.normal(ks[0], (b, h2, S, 2 * D), jnp.float32)
         * pre * 0.02).astype(jnp.bfloat16)
    k = jax.random.randint(ks[1], (b, h2, 2, S, D), -127, 127, jnp.int8)
    v = jax.random.randint(ks[2], (b, h2, 2, S, D), -127, 127, jnp.int8)

    def hi_of(i):
        return (((i + 1) * bq) + bkvm - 1) // bkvm

    def kv_idx(bi, hp, i, j):
        if causal:
            return (bi, hp, 0, jnp.minimum(j, hi_of(i) - 1), 0)
        return (bi, hp, 0, j, 0)

    kern = functools.partial(
        hpack_kernel, bq=bq, bkv=bkv, n_inner=n_inner, causal=causal)
    f = pl.pallas_call(
        kern,
        grid=(b, h2, ni, nj),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, 2 * D), lambda b, hp, i, j: (b, hp, i, 0)),
            pl.BlockSpec((1, 1, 2, bkvm, D), kv_idx),
            pl.BlockSpec((1, 1, 2, bkvm, D), kv_idx),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, 2 * D), lambda b, hp, i, j: (b, hp, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h2, S, 2 * D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary"),
        ),
    )
    fj = jax.jit(f)
    fj(q, k, v)
    return fj, (q, k, v)


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    arms = [
        ("prod causal d64 (wrapper ctl)",
         lambda b: build_prod(D, h, b, True), 0.5),
        ("lean  causal d64 512x512x4",
         lambda b: build_lean(D, h, b, 512, 512, 4, True, 1), 0.5),
        ("hpack causal d64 512x512x4",
         lambda b: build_hpack(h, b, 512, 512, 4, True), 0.5),
        ("hpack FULL   d64 512x512x4",
         lambda b: build_hpack(h, b, 512, 512, 4, False), 1.0),
        ("lean  FULL   d64 512x512x4",
         lambda b: build_lean(D, h, b, 512, 512, 4, False, 1), 1.0),
        ("hpack causal d64 512x512x2",
         lambda b: build_hpack(h, b, 512, 512, 2, True), 0.5),
    ]
    for name, builder, frac in arms:
        fl = 4 * h * S * S * D * frac
        try:
            sec = slope(builder)
            print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
