"""Slope-based in-kernel cost attribution at d=64 (the VPU-bound case).

Same stripped-kernel ladder as exp11 (dots -> +exp -> +stats) but every
rate is a two-point batch slope, so the tunnel's dispatch intercept is
gone.  Run SOLO on the TPU.  Args: [d] [bq] [bkv] [n_inner]
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.attention.masking import FULL  # noqa: E402
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention_forward, BlockSizes,
)

H, S = 8, 4096
LANES = 128


def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, variant,
           block_kv, n_inner, head_dim):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    for t in range(n_inner):
        k = k_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
        v = v_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant == "dots":
            p = s
        elif variant == "exp":
            p = jnp.exp2(s - 10.0)
        elif variant == "expsum":
            p = jnp.exp2(s - 10.0)
            l_scr[...] = l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        else:  # stats
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - pltpu.repeat(m_next, block_kv // LANES, axis=1))
            m_scr[...] = m_next
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        if variant == "stats":
            if head_dim == LANES:
                acc_scr[...] = acc_scr[...] * alpha + pv
            elif head_dim % LANES == 0:
                acc_scr[...] = (
                    acc_scr[...] * pltpu.repeat(alpha, head_dim // LANES,
                                                axis=1) + pv)
            else:
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv
        else:
            acc_scr[...] = acc_scr[...] + pv

    @pl.when(j == pl.num_programs(3) - 1)
    def _():
        o_ref[0, 0] = (acc_scr[...] / 1024.0).astype(o_ref.dtype)


def build(variant, d, bq, bkv, n_inner, b):
    bkvm = bkv * n_inner
    nj = S // bkvm
    kern = functools.partial(kernel, variant=variant, block_kv=bkv,
                             n_inner=n_inner, head_dim=d)
    grid = (b, H, S // bq, nj)
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
    flops_b = 2 * 2 * H * S * S * d  # full-mask (no causal halving)

    for variant in ("dots", "exp", "expsum", "stats"):
        try:
            sec = slope(lambda b: build(variant, d, bq, bkv, n_inner, b))
            print(f"{variant:7s} {flops_b / sec / 1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{variant} FAILED {str(e)[:80]}", flush=True)

    # production FULL kernel for the same shape
    def prod(b):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, H, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, H, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, H, S, d), jnp.bfloat16)
        bl = BlockSizes(block_q=bq, block_kv=bkv,
                        block_kv_major=bkv * n_inner)
        f = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k, v, mask=FULL, block_sizes=bl, interpret=False)[0])
        f(q, k, v)
        return f, (q, k, v)

    sec = slope(prod)
    print(f"prod    {flops_b / sec / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
