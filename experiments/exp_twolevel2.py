"""Round-2 experiment v2: packed-pair schedule at MAJOR granularity +
two-level inner KV tiling + fast-exp2 softmax variants.

Variants per (d, causal):
  lib          : current library kernel
  tl           : packed+two-level, builtin exp2 (base-2 softmax)
  tl-nomask    : same but masking disabled (perf isolation, wrong numerics)
  tl-schraud   : schraudolph 1-op exp2 approx
  tl-poly2     : degree-2 poly exp2 approx
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
    flash_attention_forward, build_packed_schedule,
)

NEG_INF = -jnp.inf
LANES = 128
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
LOG2E = float(np.log2(np.e))


def _cdiv(a, b):
    return -(-a // b)


def make_exp2(kind):
    if kind == "builtin":
        return jnp.exp2
    if kind == "schraud":
        def e(x):
            # Schraudolph: 2^x ~= bitcast(int32((x+127) * 2^23))
            x = jnp.maximum(x, -126.0)
            i = ((x + 127.0) * 8388608.0).astype(jnp.int32)
            return jax.lax.bitcast_convert_type(i, jnp.float32)
        return e
    if kind == "poly2":
        def e(x):
            x = jnp.maximum(x, -126.0)
            xi = jnp.floor(x)
            f = x - xi
            # 2^f on [0,1): minimax-ish degree 2 (max rel err ~1e-2)...
            # use degree 3 for ~1e-4: c from Taylor at ln2 powers adjusted
            p = 1.0 + f * (0.6951937 + f * (0.2285805 + f * 0.0782680))
            i = (xi.astype(jnp.int32) + 127) << 23
            s = jax.lax.bitcast_convert_type(i, jnp.float32)
            return s * p
        return e
    raise ValueError(kind)


def kernel(q0_ref, q1_ref, n0_ref, t_ref, lo_ref, hi_ref,
           q_ref, k_ref, v_ref, o_ref, l_ref, m_scr, l_scr, acc_scr,
           *, bq, bkv_inner, n_inner, d, causal, masked, exp_kind):
    exp2 = make_exp2(exp_kind)
    r = pl.program_id(2)
    j = pl.program_id(3)
    n0 = n0_ref[r]
    seg1 = jnp.logical_and(j >= n0, t_ref[r] > n0)
    row_block = jnp.where(seg1, q1_ref[r], q0_ref[r])
    jj = j - jnp.where(seg1, n0, 0)
    lo = lo_ref[row_block]
    run = hi_ref[row_block] - lo
    valid = j < t_ref[r]
    live = jnp.logical_and(valid, jj < run)
    init_cond = jnp.logical_or(
        j == 0, jnp.logical_and(seg1, jnp.logical_and(jj == 0, valid)))
    store_cond = jnp.logical_and(valid, jj == jnp.maximum(run, 1) - 1)
    kv_major = lo + jj

    @pl.when(init_cond)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]
        for t in range(n_inner):
            k = k_ref[0, 0, pl.ds(t * bkv_inner, bkv_inner), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if causal and masked:
                col = (jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bkv_inner), 1)
                    + (kv_major * n_inner + t) * bkv_inner)
                row = (jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bkv_inner), 0) + row_block * bq)
                s = jnp.where(col <= row, s, MASK_VALUE)
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = exp2(m_prev - m_next)
            p = exp2(s - pltpu.repeat(m_next, bkv_inner // LANES, axis=1))
            l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next
            v = v_ref[0, 0, pl.ds(t * bkv_inner, bkv_inner), :]
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            if d == LANES:
                acc_scr[...] = acc_scr[...] * alpha + pv
            elif d % LANES == 0:
                acc_scr[...] = (acc_scr[...] *
                                pltpu.repeat(alpha, d // LANES, axis=1) + pv)
            else:
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(store_cond)
    def _store():
        lsum = l_scr[...]
        safe = jnp.where(lsum == 0.0, 1.0, lsum)
        if d == LANES:
            out = acc_scr[...] / safe
        elif d % LANES == 0:
            out = acc_scr[...] / pltpu.repeat(safe, d // LANES, axis=1)
        else:
            out = acc_scr[...] / safe[:, :1]
        o_ref[0, 0] = out.astype(o_ref.dtype)
        # lse natural-log convention: m (log2) * ln2 + log(l)
        l_ref[0, 0] = m_scr[...] * float(np.log(2.0)) + jnp.log(safe)


def tl_fwd(q, k, v, *, causal, bq=512, bkv_inner=512, n_inner=2,
           masked=True, exp_kind="builtin", scale=None):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    # base-2 softmax: fold log2(e) into the Q pre-scale
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    bkv_major = bkv_inner * n_inner
    ni = _cdiv(sq, bq)
    nj_all = _cdiv(skv, bkv_major)
    if causal:
        hi = np.array([_cdiv((i + 1) * bq, bkv_major) for i in range(ni)],
                      np.int32)
    else:
        hi = np.full(ni, nj_all, np.int32)
    lo = np.zeros(ni, np.int32)
    q0a, q1a, n0a, ta, nrows, width = build_packed_schedule(lo, hi)

    def seg1_of(r, j, n0, t):
        return jnp.logical_and(j >= n0[r], t[r] > n0[r])

    def qi_of(r, j, q0, q1, n0, t):
        return jnp.where(seg1_of(r, j, n0, t), q1[r], q0[r])

    def kv_block_p(r, j, q0, q1, n0, t, lo, hi):
        qi = qi_of(r, j, q0, q1, n0, t)
        jj = j - jnp.where(seg1_of(r, j, n0, t), n0[r], 0)
        run = hi[qi] - lo[qi]
        return jnp.clip(lo[qi] + jnp.minimum(jj, run - 1), 0, nj_all - 1)

    q_map = lambda bi, hh, r, j, q0, q1, n0, t, lo, hi: (
        bi, hh, qi_of(r, j, q0, q1, n0, t), 0)
    kv_map = lambda bi, hh, r, j, q0, q1, n0, t, lo, hi: (
        bi, hh, kv_block_p(r, j, q0, q1, n0, t, lo, hi), 0)

    kern = functools.partial(
        kernel, bq=bq, bkv_inner=bkv_inner, n_inner=n_inner, d=d,
        causal=causal, masked=masked, exp_kind=exp_kind)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b, h, nrows, width),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bkv_major, d), kv_map),
            pl.BlockSpec((1, 1, bkv_major, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), q_map),
            pl.BlockSpec((1, 1, bq, LANES), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
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
    )(jnp.asarray(q0a), jnp.asarray(q1a), jnp.asarray(n0a),
      jnp.asarray(ta), jnp.asarray(lo), jnp.asarray(hi), q, k, v)
    return o, l[:, :, :, 0]


def bench_all():
    B, H, S = 4, 8, 4096
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
            t = measure(lib, q, k, v, iters=30, warmup=3, trains=5)
            print(f"d={d} causal={int(causal)} lib                  "
                  f"{flops/t/1e12:7.1f} TF/s")
            sys.stdout.flush()

            cfgs = [(512, 512, 2), (512, 512, 4), (1024, 512, 2),
                    (512, 1024, 2), (1024, 1024, 2)]
            if d == 64:
                cfgs += [(1024, 512, 4), (512, 512, 8), (1024, 1024, 4)]
            for (bq, bkvi, ni_) in cfgs:
                for exp_kind in ("builtin", "schraud", "poly2"):
                    if exp_kind != "builtin" and (bq, bkvi, ni_) != (512, 512, 2):
                        continue  # exp variants only on one geometry
                    try:
                        f = jax.jit(functools.partial(
                            tl_fwd, causal=causal, bq=bq, bkv_inner=bkvi,
                            n_inner=ni_, exp_kind=exp_kind))
                        o_p, _ = f(q, k, v)
                        err = float(jnp.max(jnp.abs(
                            o_p - o_ref.astype(jnp.float32))))
                        gate = 5e-2 if exp_kind == "builtin" else 2e-1
                        tag = ""
                        if err > gate:
                            tag = f"  ERR={err:.3g}"
                        t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
                        print(f"d={d} causal={int(causal)} "
                              f"tl({bq},{bkvi}x{ni_},{exp_kind})"
                              f"{'':6s}{flops/t/1e12:7.1f} TF/s"
                              f"  err={err:.2e}{tag}")
                    except Exception as e:
                        print(f"  tl({bq},{bkvi}x{ni_},{exp_kind}) failed: "
                              f"{type(e).__name__}: {str(e)[:100]}")
                    sys.stdout.flush()
            if causal:
                # mask-off isolation run
                try:
                    f = jax.jit(functools.partial(
                        tl_fwd, causal=causal, bq=512, bkv_inner=512,
                        n_inner=2, masked=False))
                    f(q, k, v)
                    t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
                    print(f"d={d} causal=1 tl-nomask(512,512x2)   "
                          f"{flops/t/1e12:7.1f} TF/s  (perf only)")
                except Exception as e:
                    print(f"  nomask failed: {e}")
                sys.stdout.flush()


if __name__ == "__main__":
    bench_all()
