"""Pin the per-segment bubble: which part of a segment boundary costs?

Flat grid, uniform windows of `width` majors per q-block (zero raggedness,
no mask).  Ablate: store at boundary / acc init at boundary / q-block
change at boundary.  If removing one recovers the full-window rate, that
is the bubble.  Run SOLO on the TPU.
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

B, H, S = 4, 4, 4096
LANES = 128


def kernel(bof, hof, qof, kvof, fin, fst, q_ref, k_ref, v_ref, o_ref,
           m_scr, l_scr, acc_scr, *, block_q, block_kv, n_inner, head_dim):
    j = pl.program_id(0)

    @pl.when(fin[j] == 1)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    for t in range(n_inner):
        k = k_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - pltpu.repeat(m_next, block_kv // LANES, axis=1))
        m_scr[...] = m_next
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0, pl.ds(t * block_kv, block_kv), :]
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scr[...] = (
            acc_scr[...] * pltpu.repeat(alpha, head_dim // LANES, axis=1)
            + pv)

    @pl.when(fst[j] == 1)
    def _():
        l = l_scr[...]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / pltpu.repeat(
            safe, head_dim // LANES, axis=1)).astype(o_ref.dtype)


def run(name, d, bq, bkv, n_inner, width, *, store_every=True,
        init_every=True, same_q=False):
    bkvm = bkv * n_inner
    ni = S // bq
    qof, kvof, fin, fst = [], [], [], []
    for b in range(B):
        for h in range(H):
            for i in range(ni):
                for jj in range(width):
                    qof.append(0 if same_q else i)
                    kvof.append(jj)
                    last_seg = i == ni - 1
                    fin.append(
                        1 if (jj == 0 and (init_every or i == 0)) else 0)
                    fst.append(
                        1 if (jj == width - 1
                              and (store_every or last_seg)) else 0)
    # bof/hof folded into qof/kvof? No: separate tables required for
    # addressing; rebuild with b, h embedded.
    T = len(qof)
    bof = np.repeat(np.arange(B, dtype=np.int32), H * ni * width)
    hof = np.tile(np.repeat(np.arange(H, dtype=np.int32), ni * width), B)
    tables = [bof, hof, np.asarray(qof, np.int32),
              np.asarray(kvof, np.int32), np.asarray(fin, np.int32),
              np.asarray(fst, np.int32)]
    kern = functools.partial(kernel, block_q=bq, block_kv=bkv,
                             n_inner=n_inner, head_dim=d)
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
    print(f"{name:22s} d{d} ({bq},{bkv},M{bkvm}) w{width} T={T}  "
          f"{4 * bq * bkvm * d * T / t / 1e12:7.1f} TF/s  "
          f"{t / nsub * 1e6:6.3f} us/subtile")
    sys.stdout.flush()


def run_repeat(reps, d=256, bq=1024, bkv=512, n_inner=2, width=4):
    """Same w4 schedule repeated `reps` times in ONE call: t(T) line."""
    bkvm = bkv * n_inner
    ni = S // bq
    qof, kvof, fin, fst = [], [], [], []
    for _ in range(reps):
        for i in range(ni):
            for jj in range(width):
                qof.append(i)
                kvof.append(jj)
                fin.append(1 if jj == 0 else 0)
                fst.append(1 if jj == width - 1 else 0)
    per = ni * width * reps
    T = B * H * per
    bof = np.repeat(np.arange(B, dtype=np.int32), H * per)
    hof = np.tile(np.repeat(np.arange(H, dtype=np.int32), per), B)
    tables = [bof, hof,
              np.tile(np.asarray(qof, np.int32), B * H),
              np.tile(np.asarray(kvof, np.int32), B * H),
              np.tile(np.asarray(fin, np.int32), B * H),
              np.tile(np.asarray(fst, np.int32), B * H)]
    kern = functools.partial(kernel, block_q=bq, block_kv=bkv,
                             n_inner=n_inner, head_dim=d)
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
    print(f"reps{reps}  T={T}  t={t * 1e6:9.1f} us  "
          f"{t / T * 1e6:6.3f} us/step")
    sys.stdout.flush()
    return T, t


def main():
    pts = [run_repeat(r) for r in (1, 2, 4, 8)]
    (t1, y1), (t2, y2) = pts[0], pts[-1]
    slope = (y2 - y1) / (t2 - t1)
    icept = y1 - slope * t1
    print(f"slope {slope * 1e6:.3f} us/step, intercept {icept * 1e6:.1f} us")
    flops_step = 4 * 1024 * 1024 * 256
    print(f"steady-state rate {flops_step / slope / 1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
