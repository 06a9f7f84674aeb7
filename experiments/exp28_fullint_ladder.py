"""Fullint (int8 x int8 both dots) kernel ladder vs bf16, FULL mask.

exp27 proved the int8 MXU rate is real (~450 TF/s Pallas, 2.3x bf16
within-run).  The production int8_pv path still measures <=1.16x the
float kernel — so the binding constraint is VPU/pipeline, not MXU.
This ladder attributes the gap and tests the candidate fix:

  LOCAL-MAX DEFERRED RESCALE — per subtile, exp2 uses the subtile-local
  max (no dependency on the running max), and the online merge happens on
  [bq,128]/[bq,dv] tensors only (beta multiplies the PV *result*, not P).
  The serial cross-subtile dependency no longer touches any [bq,bkv]
  tensor, so subtile t+1's big VPU passes need not wait on t's merge.

Variants:
  dots16 / dots8     MXU+DMA floor (bf16 / both-int8 dots, no softmax)
  base16             production-style running-max softmax, bf16 dots
  local16            local-max deferred-rescale, bf16 dots
  fullint            production int8_pv replica (running max)
  fullint_local      local-max deferred-rescale, both dots int8
  fullint_trunc      fullint_local without the +0.5 (truncating requant)

Usage: python exp28_fullint_ladder.py [d] [bq] [bkv] [n_inner]
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

H, S = 8, 4096
LANES = 128
LOG2_127 = float(np.log2(127.0))


def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, variant,
           block_kv, n_inner, head_dim):
    j = pl.program_id(3)
    int8_dots = variant in ("dots8", "fullint", "fullint_local",
                            "fullint_trunc")
    local = variant in ("local16", "fullint_local", "fullint_trunc")

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    c = 0.001  # stand-in for the folded per-row scale constant

    for t in range(n_inner):
        k = k_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
        v = v_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
        if int8_dots:
            s_int = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = s_int.astype(jnp.float32) * c
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if variant in ("dots16", "dots8"):
            p = s
            pv = jax.lax.dot(
                p.astype(jnp.bfloat16) if not int8_dots else
                (p * 0.001).astype(jnp.int8),
                v, preferred_element_type=(
                    jnp.int32 if int8_dots else jnp.float32))
            acc_scr[...] = acc_scr[...] + pv.astype(jnp.float32)
            continue

        if local:
            # exp2 depends only on THIS subtile; merge on small tensors.
            m_t = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
            arg = s - pltpu.repeat(
                jnp.broadcast_to(m_t, (s.shape[0], LANES)),
                block_kv // LANES, axis=1)
            if int8_dots:
                p127 = jnp.exp2(arg + LOG2_127)
                if variant == "fullint_trunc":
                    p_q = p127.astype(jnp.int32).astype(jnp.int8)
                else:
                    p_q = (p127 + 0.5).astype(jnp.int32).astype(jnp.int8)
                l_t = jnp.sum(p127, axis=1, keepdims=True)
                pv = jax.lax.dot_general(
                    p_q, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                p = jnp.exp2(arg)
                l_t = jnp.sum(p, axis=1, keepdims=True)
                pv = jax.lax.dot(
                    p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
            m_prev = m_scr[...]  # [bq, LANES] replicated
            m_tw = jnp.broadcast_to(m_t, (s.shape[0], LANES))
            m_new = jnp.maximum(m_prev, m_tw)
            alpha = jnp.exp2(m_prev - m_new)
            beta = jnp.exp2(m_tw - m_new)
            m_scr[...] = m_new
            l_scr[...] = alpha * l_scr[...] + beta * l_t
            if head_dim == LANES:
                acc_scr[...] = acc_scr[...] * alpha + beta * pv
            elif head_dim % LANES == 0:
                r = head_dim // LANES
                acc_scr[...] = (
                    acc_scr[...] * pltpu.repeat(alpha, r, axis=1)
                    + pltpu.repeat(beta, r, axis=1) * pv)
            else:
                acc_scr[...] = (
                    acc_scr[...] * alpha[:, :1] + beta[:, :1] * pv)
        else:
            # Running-max (production structure).
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            m_wide = pltpu.repeat(m_next, block_kv // LANES, axis=1)
            if int8_dots:
                p127 = jnp.exp2(s + (LOG2_127 - m_wide))
                p_q = (p127 + 0.5).astype(jnp.int32).astype(jnp.int8)
                l_scr[...] = (alpha * l_scr[...]
                              + jnp.sum(p127, axis=1, keepdims=True))
                pv = jax.lax.dot_general(
                    p_q, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                p = jnp.exp2(s - m_wide)
                l_scr[...] = (alpha * l_scr[...]
                              + jnp.sum(p, axis=1, keepdims=True))
                pv = jax.lax.dot(
                    p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
            m_scr[...] = m_next
            if head_dim == LANES:
                acc_scr[...] = acc_scr[...] * alpha + pv
            elif head_dim % LANES == 0:
                acc_scr[...] = (
                    acc_scr[...]
                    * pltpu.repeat(alpha, head_dim // LANES, axis=1) + pv)
            else:
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(j == pl.num_programs(3) - 1)
    def _():
        o_ref[0, 0] = (acc_scr[...] / 1024.0).astype(o_ref.dtype)


def build(variant, d, bq, bkv, n_inner, b):
    bkvm = bkv * n_inner
    nj = S // bkvm
    int8_dots = variant in ("dots8", "fullint", "fullint_local",
                            "fullint_trunc")
    kern = functools.partial(kernel, variant=variant, block_kv=bkv,
                             n_inner=n_inner, head_dim=d)
    grid = (b, H, S // bq, nj)
    # m replicated [bq, LANES] matches production layout.
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bkvm, d), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bkvm, d), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda b, h, i, j: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, H, S, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    if int8_dots:
        q = jax.random.randint(ks[0], (b, H, S, d), -127, 127, jnp.int8)
        k = jax.random.randint(ks[1], (b, H, S, d), -127, 127, jnp.int8)
        v = jax.random.randint(ks[2], (b, H, S, d), -127, 127, jnp.int8)
    else:
        q = jax.random.normal(ks[0], (b, H, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, H, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, H, S, d), jnp.bfloat16)
    fj = jax.jit(f)
    fj(q, k, v)
    return fj, (q, k, v)


def slope(builder, b1=4, b2=16):
    f1, a1 = builder(b1)
    f2, a2 = builder(b2)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - b1)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bkv = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    n_inner = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    flops_b = 2 * 2 * H * S * S * d  # full-mask op model

    for variant in ("dots16", "dots8", "base16", "local16",
                    "fullint", "fullint_local", "fullint_trunc"):
        try:
            sec = slope(lambda b: build(variant, d, bq, bkv, n_inner, b))
            print(f"{variant:14s} {flops_b / sec / 1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:14s} FAILED {type(e).__name__} {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
