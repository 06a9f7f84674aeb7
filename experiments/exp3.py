"""Round-2 exp3: dense two-level grid + inner-skip + giant bodies +
d<128 ones-fused rowsum (l rides spare MXU lanes).

Variants (dense (b,h,i,j_major) grid, clamp-skipped major windows):
  is0 : unconditional inner compute (tl baseline)
  is1 : pl.when inner-skip per subtile (removes ceil waste on causal)
  ones: d=64 only — V padded [*,128] with ones in cols d..127; acc [bq,128]
        carries (O | l·ones); removes sum-reduce pass + [:, :1] relayouts.
Also: full-mask S-scaling diagnostic (short-row cost probe).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward,
)

NEG_INF = -jnp.inf
LANES = 128
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
LOG2E = float(np.log2(np.e))


def _cdiv(a, b):
    return -(-a // b)


def kernel(lo_ref, hi_ref, hii_ref, q_ref, k_ref, v_ref, o_ref, l_ref,
           *scratch, bq, bkv_inner, n_inner, d, causal, inner_skip, ones):
    if ones:
        m_scr, acc_scr = scratch
    else:
        m_scr, l_scr, acc_scr = scratch
    i = pl.program_id(2)
    j = pl.program_id(3)
    lo = lo_ref[i]
    run = hi_ref[i] - lo
    live_major = j < run
    kv_major = lo + j
    hii = hii_ref[i]  # live inner-tile count for this q-block

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if not ones:
            l_scr[...] = jnp.zeros_like(l_scr)

    def inner(t):
        k = k_ref[0, 0, pl.ds(t * bkv_inner, bkv_inner), :]
        q = q_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if causal:
            col = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv_inner), 1)
                   + (kv_major * n_inner + t) * bkv_inner)
            row = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv_inner), 0)
                   + i * bq)
            s = jnp.where(col <= row, s, MASK_VALUE)
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - pltpu.repeat(m_next, bkv_inner // LANES, axis=1))
        m_scr[...] = m_next
        v = v_ref[0, 0, pl.ds(t * bkv_inner, bkv_inner), :]
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        if ones:
            # acc [bq, 128] = (O cols 0:d | rowsum(p) cols d:128); v was
            # padded with ones there, so pv already carries the sum and
            # alpha applies uniformly — no separate l pass, no relayouts.
            acc_scr[...] = acc_scr[...] * alpha + pv
        else:
            l_scr[...] = (alpha * l_scr[...]
                          + jnp.sum(p, axis=1, keepdims=True))
            if d == LANES:
                acc_scr[...] = acc_scr[...] * alpha + pv
            elif d % LANES == 0:
                acc_scr[...] = (acc_scr[...]
                                * pltpu.repeat(alpha, d // LANES, axis=1)
                                + pv)
            else:
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(live_major)
    def _compute():
        for t in range(n_inner):
            if inner_skip:
                @pl.when(kv_major * n_inner + t < hii)
                def _():
                    inner(t)
            else:
                inner(t)

    @pl.when(j == jnp.maximum(run, 1) - 1)
    def _store():
        if ones:
            acc = acc_scr[...]
            lsum = acc[:, d:]  # [bq, 128-d] replicated sums
            safe = jnp.where(lsum == 0.0, 1.0, lsum)
            out = acc[:, :d] / safe[:, :d]
            o_ref[0, 0] = out.astype(o_ref.dtype)
            lse = m_scr[...] * float(np.log(2.0)) + jnp.log(
                jnp.where(lsum[:, :1] == 0.0, 1.0, lsum[:, :1]))
            l_ref[0, 0] = jnp.broadcast_to(lse, l_ref.shape[2:])
        else:
            lsum = l_scr[...]
            safe = jnp.where(lsum == 0.0, 1.0, lsum)
            if d == LANES:
                out = acc_scr[...] / safe
            elif d % LANES == 0:
                out = acc_scr[...] / pltpu.repeat(safe, d // LANES, axis=1)
            else:
                out = acc_scr[...] / safe[:, :1]
            o_ref[0, 0] = out.astype(o_ref.dtype)
            l_ref[0, 0] = m_scr[...] * float(np.log(2.0)) + jnp.log(safe)


def fwd(q, k, v, *, causal, bq=512, bkv_inner=512, n_inner=2,
        inner_skip=False, ones=False, scale=None):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    dv = d
    if ones:
        assert d < LANES
        pad = jnp.concatenate([
            v, jnp.ones((b, h, skv, LANES - d), v.dtype)], axis=-1)
        v = pad
        dv = LANES
    bkv_major = bkv_inner * n_inner
    ni = _cdiv(sq, bq)
    nj_all = _cdiv(skv, bkv_major)
    if causal:
        hi = np.array([_cdiv((i + 1) * bq, bkv_major) for i in range(ni)],
                      np.int32)
        hii = np.array([_cdiv((i + 1) * bq, bkv_inner) for i in range(ni)],
                       np.int32)
    else:
        hi = np.full(ni, nj_all, np.int32)
        hii = np.full(ni, _cdiv(skv, bkv_inner), np.int32)
    lo = np.zeros(ni, np.int32)
    nj_max = int(hi.max())

    def kv_block(i, j, lo, hi, hii):
        run = hi[i] - lo[i]
        return jnp.clip(lo[i] + jnp.minimum(j, run - 1), 0, nj_all - 1)

    kern = functools.partial(
        kernel, bq=bq, bkv_inner=bkv_inner, n_inner=n_inner, d=d,
        causal=causal, inner_skip=inner_skip, ones=ones)
    scratch = [pltpu.VMEM((bq, LANES), jnp.float32)]  # m
    if not ones:
        scratch.append(pltpu.VMEM((bq, LANES), jnp.float32))  # l
    scratch.append(pltpu.VMEM((bq, LANES if ones else d), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, h, ni, nj_max),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda bi, hh, i, j, lo, hi, hii: (bi, hh, i, 0)),
            pl.BlockSpec((1, 1, bkv_major, d),
                         lambda bi, hh, i, j, lo, hi, hii:
                         (bi, hh, kv_block(i, j, lo, hi, hii), 0)),
            pl.BlockSpec((1, 1, bkv_major, dv),
                         lambda bi, hh, i, j, lo, hi, hii:
                         (bi, hh, kv_block(i, j, lo, hi, hii), 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda bi, hh, i, j, lo, hi, hii: (bi, hh, i, 0)),
            pl.BlockSpec((1, 1, bq, LANES),
                         lambda bi, hh, i, j, lo, hi, hii: (bi, hh, i, 0)),
        ],
        scratch_shapes=scratch,
    )
    o, l = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, sq, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
    )(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(hii), q, k, v)
    return o, l[:, :, :, 0]


def main():
    B, H, S = 4, 8, 4096
    # --- S-scaling diagnostic: full-mask per-tile cost vs run length ---
    d = 128
    for s_ in (1024, 2048, 4096):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, s_, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, s_, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, s_, d), jnp.bfloat16)
        flops = 2 * 2 * B * H * s_ * s_ * d
        f = jax.jit(functools.partial(fwd, causal=False, bq=512,
                                      bkv_inner=512, n_inner=2))
        f(q, k, v)
        t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
        ntiles = B * H * (s_ // 512) * (s_ // 512)
        print(f"FULL d128 S={s_}: {flops/t/1e12:6.1f} TF/s   "
              f"per-inner-tile {t/ntiles*1e6:.2f} us")
        sys.stdout.flush()

    for d in (64, 128, 256):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, S, d), jnp.bfloat16)
        for causal in (True, False):
            flops = 2 * 2 * B * H * S * S * d * (0.5 if causal else 1.0)
            mask = CAUSAL if causal else FULL
            lib = jax.jit(lambda q, k, v: flash_attention_forward(
                q, k, v, mask=mask, interpret=False)[0])
            o_ref = lib(q, k, v)

            cfgs = [(512, 512, 2, False), (512, 512, 4, True),
                    (512, 512, 8, True), (1024, 1024, 2, True),
                    (512, 1024, 2, True), (512, 1024, 4, True)]
            if d == 256:
                cfgs = [c for c in cfgs if c[1] * c[2] <= 2048]
            ones_opts = [False] + ([True] if d == 64 else [])
            for (bq, bkvi, ni_, isk) in cfgs:
                for on in ones_opts:
                    try:
                        f = jax.jit(functools.partial(
                            fwd, causal=causal, bq=bq, bkv_inner=bkvi,
                            n_inner=ni_, inner_skip=isk, ones=on))
                        o_p, _ = f(q, k, v)
                        err = float(jnp.max(jnp.abs(
                            o_p - o_ref.astype(jnp.float32))))
                        tag = f"  ERR={err:.3g}" if err > 5e-2 else ""
                        t = measure(f, q, k, v, iters=30, warmup=3,
                                    trains=5)
                        o_s = ",ones" if on else ""
                        i_s = ",is" if isk else ""
                        print(f"d={d} c={int(causal)} "
                              f"({bq},{bkvi}x{ni_}{i_s}{o_s}) "
                              f"{flops/t/1e12:7.1f} TF/s{tag}")
                    except Exception as e:
                        print(f"  ({bq},{bkvi}x{ni_},is={isk},ones={on}) "
                              f"d={d} c={causal} failed: "
                              f"{type(e).__name__}: {str(e)[:90]}")
                    sys.stdout.flush()


if __name__ == "__main__":
    main()
