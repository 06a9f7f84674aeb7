"""Flat segment schedule prototype: ONE long grid row for the whole chip.

exp13 showed the causal fwd loss is neither masking nor packing but a
per-row cost (short rows never amortize it).  Here the ENTIRE schedule
(b, h, q-block, kv-major) is flattened into a single arbitrary grid
dimension driven by int32 scalar-prefetch step tables; accumulators
init/store on flag tables exactly like the packed kernel's segments.

Variants: flat-full (all majors), flat-causal (live majors only, no mask
pass — schedule cost only).  Compare against exp13's prod numbers.
Run SOLO on the TPU.
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

B, H, S = 4, 8, 4096
LANES = 128


def kernel(bof, hof, qof, kvof, fin, fst, q_ref, k_ref, v_ref, o_ref,
           m_scr, l_scr, acc_scr, *, block_q, block_kv, n_inner, head_dim,
           when_live=False, maskpass=False, lse_store=False):
    j = pl.program_id(0)

    @pl.when(fin[j] == 1)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _loop():
        q = q_ref[0, 0]
        for t in range(n_inner):
            k = k_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if maskpass:
                col = (jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 1)
                    + (kvof[j] * n_inner + t) * block_kv)
                row = (jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 0)
                    + qof[j] * block_q)
                s = jnp.where(col <= row, s, -0.7 * 3.4e38)
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - pltpu.repeat(m_next, block_kv // LANES, axis=1))
            m_scr[...] = m_next
            l_scr[...] = alpha * l_scr[...] + jnp.sum(
                p, axis=1, keepdims=True)
            v = v_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
            pv = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            if head_dim == LANES:
                acc_scr[...] = acc_scr[...] * alpha + pv
            else:
                acc_scr[...] = (
                    acc_scr[...]
                    * pltpu.repeat(alpha, head_dim // LANES, axis=1) + pv)

    if when_live:

        @pl.when(fst[j] >= 0)  # scalar-dependent but always true
        def _():
            _loop()

    else:
        _loop()

    @pl.when(fst[j] == 1)
    def _():
        l = l_scr[...]
        safe = jnp.where(l == 0.0, 1.0, l)
        if head_dim == LANES:
            out = acc_scr[...] / safe
        else:
            out = acc_scr[...] / pltpu.repeat(
                safe, head_dim // LANES, axis=1)
        if lse_store:
            lse = jnp.where(l > 0.0, m_scr[...] * 0.6931 + jnp.log(safe),
                            -1e30)
            out = out + 0.0 * pltpu.repeat(
                lse, max(1, head_dim // LANES), axis=1)[:, :head_dim]
        o_ref[0, 0] = out.astype(o_ref.dtype)


def build_tables(causal, bq, bkvm):
    """Step tables covering (b, h, qblock, live major) in one flat dim."""
    ni, njall = S // bq, S // bkvm
    bof, hof, qof, kvof, fin, fst = [], [], [], [], [], []
    for b in range(B):
        for h in range(H):
            for i in range(ni):
                hi = njall
                if causal:
                    hi = -(-((i + 1) * bq) // bkvm)
                for jj in range(hi):
                    bof.append(b)
                    hof.append(h)
                    qof.append(i)
                    kvof.append(jj)
                    fin.append(1 if jj == 0 else 0)
                    fst.append(1 if jj == hi - 1 else 0)
    arrs = [np.asarray(x, np.int32) for x in
            (bof, hof, qof, kvof, fin, fst)]
    return arrs, len(bof)


def run(name, causal, d, bq, bkv, n_inner, **kw):
    bkvm = bkv * n_inner
    tables, T = build_tables(causal, bq, bkvm)
    kern = functools.partial(kernel, block_q=bq, block_kv=bkv,
                             n_inner=n_inner, head_dim=d, **kw)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, d),
                    lambda j, bof, hof, qof, kvof, fin, fst:
                    (bof[j], hof[j], qof[j], 0)),
                pl.BlockSpec(
                    (1, 1, bkvm, d),
                    lambda j, bof, hof, qof, kvof, fin, fst:
                    (bof[j], hof[j], kvof[j], 0)),
                pl.BlockSpec(
                    (1, 1, bkvm, d),
                    lambda j, bof, hof, qof, kvof, fin, fst:
                    (bof[j], hof[j], kvof[j], 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d),
                lambda j, bof, hof, qof, kvof, fin, fst:
                (bof[j], hof[j], qof[j], 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, S, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, d), jnp.bfloat16)
    fj = jax.jit(lambda q, k, v: f(*[jnp.asarray(x) for x in tables],
                                   q, k, v))
    fj(q, k, v)
    t = measure(fj, q, k, v, iters=30, warmup=3)
    nsub = T * n_inner
    flops = 4 * bq * bkvm * d * T
    print(f"{name:12s} d{d} ({bq},{bkv},M{bkvm}) T={T}  "
          f"{flops / t / 1e12:7.1f} TF/s  {t / nsub * 1e6:6.3f} us/subtile")
    sys.stdout.flush()


def main():
    global H
    import itertools  # noqa: F401
    cfgs = [
        ("base", True, 256, 4, 1024, 512, 2, {}),
        ("when", True, 256, 4, 1024, 512, 2, {"when_live": True}),
        ("mask", True, 256, 4, 1024, 512, 2, {"maskpass": True}),
        ("lse", True, 256, 4, 1024, 512, 2, {"lse_store": True}),
        ("all3", True, 256, 4, 1024, 512, 2,
         {"when_live": True, "maskpass": True, "lse_store": True}),
        ("base", True, 128, 8, 512, 512, 2, {}),
        ("all3", True, 128, 8, 512, 512, 2,
         {"when_live": True, "maskpass": True, "lse_store": True}),
    ]
    for name, causal, d, h, bq, bkv, n_inner, kw in cfgs:
        H = h
        try:
            run(name, causal, d, bq, bkv, n_inner, **kw)
        except Exception as e:  # noqa: BLE001
            print(f"{name} d{d} ({bq},{bkv},x{n_inner}) FAILED: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
