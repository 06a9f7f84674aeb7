"""Round-2 exp5: resident-KV mega-body kernel, scratch-ref accumulators.

Grid is (B, H) only: each body holds the whole K/V (and Q) block in VMEM
and runs a STATIC python loop over q-rows x kv-tiles, specialized to the
mask — causal rows get exactly their live tiles, only diagonal tiles pay
the iota/where mask, zero per-row pipeline restarts.

Variants: bq x bkv inner tile, d in {64,128,256}, ones-trick at d=64,
slim-L (transposed [1,S] store) vs lane-replicated L.
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
LN2 = float(np.log(2.0))


def _cdiv(a, b):
    return -(-a // b)


def mega_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *scratch,
                bq, bkv, d, causal, ones, slim_l, sq, skv):
    if ones:
        m_scr, acc_scr = scratch
        l_scr = None
    else:
        m_scr, l_scr, acc_scr = scratch
    ni = sq // bq
    nj_all = skv // bkv

    for i in range(ni):
        hi = min(nj_all, _cdiv((i + 1) * bq, bkv)) if causal else nj_all
        m_scr[...] = jnp.full((bq, LANES), NEG_INF, jnp.float32)
        if not ones:
            l_scr[...] = jnp.zeros((bq, LANES), jnp.float32)
        acc_scr[...] = jnp.zeros((bq, LANES if ones else d), jnp.float32)
        q = q_ref[0, 0, i * bq:(i + 1) * bq, :]
        for t in range(hi):
            k = k_ref[0, 0, t * bkv:(t + 1) * bkv, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            diag = causal and (t + 1) * bkv > i * bq + 1
            if diag:
                col = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
                       + t * bkv)
                row = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
                       + i * bq)
                s = jnp.where(col <= row, s, MASK_VALUE)
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            m_scr[...] = m_next
            p = jnp.exp2(s - pltpu.repeat(m_next, bkv // LANES, axis=1))
            v = v_ref[0, 0, t * bkv:(t + 1) * bkv, :]
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            if ones:
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
        # store row
        if ones:
            acc = acc_scr[...]
            lsum = acc[:, d:]
            safe = jnp.where(lsum == 0.0, 1.0, lsum)
            out = acc[:, :d] / safe[:, :d]
            lse = m_scr[...][:, :1] * LN2 + jnp.log(
                jnp.where(lsum[:, :1] == 0.0, 1.0, lsum[:, :1]))
        else:
            acc = acc_scr[...]
            l_prev = l_scr[...]
            safe = jnp.where(l_prev == 0.0, 1.0, l_prev)
            if d == LANES:
                out = acc / safe
            elif d % LANES == 0:
                out = acc / pltpu.repeat(safe, d // LANES, axis=1)
            else:
                out = acc / safe[:, :1]
            lse = m_scr[...] * LN2 + jnp.log(safe)
        o_ref[0, 0, i * bq:(i + 1) * bq, :] = out.astype(o_ref.dtype)
        if slim_l:
            l_ref[0, 0, 0, i * bq:(i + 1) * bq] = lse[:, 0]
        else:
            if ones:
                l_ref[0, 0, i * bq:(i + 1) * bq, :] = jnp.broadcast_to(
                    lse, (bq, LANES))
            else:
                l_ref[0, 0, i * bq:(i + 1) * bq, :] = lse


def mega_fwd(q, k, v, *, causal, bq=512, bkv=512, ones=False, slim_l=False,
             scale=None):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    dv = d
    if ones:
        assert d < LANES
        v = jnp.concatenate(
            [v, jnp.ones((b, h, skv, LANES - d), v.dtype)], axis=-1)
        dv = LANES
    kern = functools.partial(
        mega_kernel, bq=bq, bkv=bkv, d=d, causal=causal, ones=ones,
        slim_l=slim_l, sq=sq, skv=skv)
    if ones:
        scratch = [pltpu.VMEM((bq, LANES), jnp.float32),
                   pltpu.VMEM((bq, LANES), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((bq, LANES), jnp.float32),
                   pltpu.VMEM((bq, LANES), jnp.float32),
                   pltpu.VMEM((bq, d), jnp.float32)]
    l_shape = (b, h, 1, sq) if slim_l else (b, h, sq, LANES)
    l_spec = (pl.BlockSpec((1, 1, 1, sq), lambda bi, hh: (bi, hh, 0, 0))
              if slim_l else
              pl.BlockSpec((1, 1, sq, LANES), lambda bi, hh: (bi, hh, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, sq, d), lambda bi, hh: (bi, hh, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hh: (bi, hh, 0, 0)),
            pl.BlockSpec((1, 1, skv, dv), lambda bi, hh: (bi, hh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sq, d), lambda bi, hh: (bi, hh, 0, 0)),
            l_spec,
        ],
        scratch_shapes=scratch,
    )
    o, l = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32),
            jax.ShapeDtypeStruct(l_shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(q, k, v)
    if slim_l:
        return o, l[:, :, 0, :]
    return o, l[:, :, :, 0]


def main():
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

            cfgs = [(512, 512), (256, 512), (512, 1024), (256, 256)]
            if d == 256:
                cfgs = [(512, 512), (256, 512)]
            ones_opts = [True, False] if d == 64 else [False]
            for (bq, bkv) in cfgs:
                for on in ones_opts:
                    for sl in ([True, False] if (bq, bkv) == (512, 512)
                               else [False]):
                        try:
                            f = jax.jit(functools.partial(
                                mega_fwd, causal=causal, bq=bq, bkv=bkv,
                                ones=on, slim_l=sl))
                            o_p, _ = f(q, k, v)
                            err = float(jnp.max(jnp.abs(
                                o_p - o_ref.astype(jnp.float32))))
                            tag = f" ERR={err:.3g}" if err > 5e-2 else ""
                            t = measure(f, q, k, v, iters=30, warmup=3,
                                        trains=5)
                            o_s = ",ones" if on else ""
                            s_s = ",slimL" if sl else ""
                            print(f"d={d} c={int(causal)} mega({bq},{bkv}"
                                  f"{o_s}{s_s}) {flops/t/1e12:7.1f} TF/s"
                                  f"{tag}")
                        except Exception as e:
                            print(f"  mega({bq},{bkv},ones={on},sl={sl}) "
                                  f"d={d} c={causal}: {type(e).__name__}: "
                                  f"{str(e)[:90]}")
                        sys.stdout.flush()


if __name__ == "__main__":
    main()
