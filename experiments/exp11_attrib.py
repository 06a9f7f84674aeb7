"""In-kernel per-tile cost attribution for the fwd flash kernel.

Replicates the production two-level full-mask schedule (no pl.when, no
mask pass) and strips pieces cumulatively:

  dots   : QK -> cast -> PV (+= acc)        — in-kernel MXU ceiling
  exp    : + exp2(s - const)                — transcendental cost
  stats  : + running max / alpha / l chain  — ~ the production kernel

Plus the production full-mask forward and the ambient XLA matmul, all in
ONE process so ratios are within-run.  Run SOLO on the TPU.
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

B, H, S = 4, 8, 4096
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
        if variant != "dots16" and variant != "pv":
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        if variant == "qk":
            # QK only: fold s straight into acc (one cheap VPU add per
            # d-lane slice) — isolates the first dot.
            acc_scr[...] = acc_scr[...] + s[:, :head_dim]
            continue
        if variant == "pv":
            # PV only: bf16 p synthesized on the VPU (iota, not zeros).
            p = (jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], block_kv), 1).astype(jnp.float32)
                * 1e-6).astype(v.dtype)
            pv = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
            acc_scr[...] = acc_scr[...] + pv
            continue
        if variant == "dots":
            p = s
        elif variant == "exp":
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
            else:
                acc_scr[...] = (
                    acc_scr[...] * pltpu.repeat(alpha, head_dim // LANES,
                                                axis=1) + pv)
        else:
            acc_scr[...] = acc_scr[...] + pv

    @pl.when(j == pl.num_programs(3) - 1)
    def _():
        o_ref[0, 0] = (acc_scr[...] / 1024.0).astype(o_ref.dtype)


def build(variant, d, bq, bkv, n_inner):
    bkvm = bkv * n_inner
    nj = S // bkvm
    kern = functools.partial(kernel, variant=variant, block_kv=bkv,
                             n_inner=n_inner, head_dim=d)
    grid = (B, H, S // bq, nj)
    return pl.pallas_call(
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
        out_shape=jax.ShapeDtypeStruct((B, H, S, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
    )


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bkv = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    n_inner = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, d), jnp.bfloat16)
    flops = 2 * 2 * B * H * S * S * d

    # ambient matmul (bf16, similar FLOP count)
    M = 8192
    a = jax.random.normal(ks[0], (M, M), jnp.bfloat16)
    bmat = jax.random.normal(ks[1], (M, M), jnp.bfloat16)
    fm = jax.jit(lambda a, b: a @ b)
    fm(a, bmat)
    t = measure(fm, a, bmat, iters=20, warmup=3)
    print(f"ambient matmul {2 * M**3 / t / 1e12:7.1f} TF/s")

    for variant in ("qk", "pv", "dots", "exp", "stats"):
        f = jax.jit(build(variant, d, bq, bkv, n_inner))
        f(q, k, v)
        t = measure(f, q, k, v, iters=20, warmup=3)
        us_tile = t / (B * H * (S // bq) * (S // bkv)) * 1e6
        fv = flops / 2 if variant in ("qk", "pv") else flops
        print(f"{variant:6s} ({bq},{bkv},M{bkv*n_inner}) "
              f"{fv / t / 1e12:7.1f} TF/s   {us_tile:6.3f} us/subtile")
        sys.stdout.flush()

    bs = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=bkv * n_inner)
    f = jax.jit(lambda q, k, v: flash_attention_forward(
        q, k, v, mask=FULL, block_sizes=bs, interpret=False)[0])
    f(q, k, v)
    t = measure(f, q, k, v, iters=20, warmup=3)
    print(f"prod-full ({bq},{bkv},M{bkv*n_inner}) {flops / t / 1e12:7.1f} TF/s")


if __name__ == "__main__":
    main()
