"""Focused within-run A/B for landing the lean-causal schedule (r4):

- prod folded-int8 causal + FULL controls (the ~117 / ~160 TF/s pins),
- lean (dense 4D grid, arithmetic index maps, no scalar prefetch,
  reciprocal epilogue) causal + FULL, one/two softmax chains.

All folded int8 KV (TENSOR-K fold in the Q pre-scale, CHANNEL-V fold at
store), S=4096, bf16 q, f32 out + L — production math.  Slope-timed
(b 4 vs 16); each arm measured and printed independently so a crash in
one arm cannot erase the others' numbers.

Usage: exp33_lean_landing.py [d] [h]
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
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: E402
    CAUSAL, FULL,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402

S = 4096
LANES = 128
LN2 = 0.6931471805599453
NEG_INF = -1e30


def kernel(q_ref, k_ref, v_ref, vsc_ref, o_ref, l_ref, m_scr, l_scr,
           acc_scr, *, bq, bkv, n_inner, d, causal, nchain):
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

    cq = bq // nchain

    def chain(c, s_c, t):
        r = pl.ds(c * cq, cq)
        m_prev = m_scr[r, :]
        m_curr = jnp.broadcast_to(
            jnp.max(s_c, axis=1, keepdims=True), (cq, LANES))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        m_wide = pltpu.repeat(m_next, bkv // LANES, axis=1)
        p = jnp.exp2(s_c - m_wide)
        l_scr[r, :] = alpha * l_scr[r, :] + jnp.sum(
            p, axis=1, keepdims=True)
        m_scr[r, :] = m_next
        v_int = v_ref[0, 0, pl.ds(t * bkv, bkv), :]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_int, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if d == LANES:
            acc_scr[r, :] = acc_scr[r, :] * alpha + pv
        elif d % LANES == 0:
            acc_scr[r, :] = acc_scr[r, :] * pltpu.repeat(
                alpha, d // LANES, axis=1) + pv
        else:
            acc_scr[r, :] = acc_scr[r, :] * alpha[:, :d] + pv

    def inner(t, masked):
        k_int = k_ref[0, 0, pl.ds(t * bkv, bkv), :]
        s = jax.lax.dot_general(
            q_ref[0, 0], k_int, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            c0 = (j * n_inner + t) * bkv
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + c0
            row = (jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
                   + i * bq)
            s = jnp.where(col <= row, s, NEG_INF)
        for c in range(nchain):
            chain(c, s[c * cq:(c + 1) * cq, :] if nchain > 1 else s, t)

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
        inv = 1.0 / safe
        if d % LANES == 0:
            out = acc_scr[...] * pltpu.repeat(inv, d // LANES, axis=1)
        else:
            out = acc_scr[...] * inv[:, :d]
        out = out * vsc_ref[0, 0]
        o_ref[0, 0] = out.astype(o_ref.dtype)
        l_ref[0, 0] = jnp.where(
            lsum > 0.0, m_scr[...] * LN2 + jnp.log(safe), NEG_INF)


def build_lean(d, h, b, bq, bkv, n_inner, causal, nchain):
    bkvm = bkv * n_inner
    ni, nj = S // bq, S // bkvm
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pre = (d ** -0.5) * 1.4426950408889634
    q = (jax.random.normal(ks[0], (b, h, S, d), jnp.float32)
         * pre * 0.02).astype(jnp.bfloat16)
    k = jax.random.randint(ks[1], (b, h, S, d), -127, 127, jnp.int8)
    v = jax.random.randint(ks[2], (b, h, S, d), -127, 127, jnp.int8)
    vsc = jnp.full((1, 1, 1, d), 0.01, jnp.float32)

    def hi_of(i):
        return (((i + 1) * bq) + bkvm - 1) // bkvm

    def kv_idx(bi, hh, i, j):
        if causal:
            return (bi, hh, jnp.minimum(j, hi_of(i) - 1), 0)
        return (bi, hh, j, 0)

    kern = functools.partial(
        kernel, bq=bq, bkv=bkv, n_inner=n_inner, d=d, causal=causal,
        nchain=nchain)
    f = pl.pallas_call(
        kern,
        grid=(b, h, ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bkvm, d), kv_idx),
            pl.BlockSpec((1, 1, bkvm, d), kv_idx),
            # vsc is a broadcast [1, 1, 1, d] constant — index map must
            # pin (0, 0, 0, 0); (b, h, 0, 0) reads out of bounds and
            # hard-faults the device (the exp32 prototype's actual bug).
            pl.BlockSpec((1, 1, 1, d), lambda b, h, i, j: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, bq, LANES), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, S, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, S, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary"),
        ),
    )
    fj = jax.jit(lambda q, k, v, vsc: f(q, k, v, vsc)[0])
    fj(q, k, v, vsc)
    return fj, (q, k, v, vsc)


def build_prod(d, h, b, causal):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    kq = quantize(k, QuantConfig(
        bits=8, granularity=QuantGranularity.TENSOR,
        strategy=QuantStrategy.SYMMETRIC))
    vq = quantize(v, QuantConfig(
        bits=8, granularity=QuantGranularity.CHANNEL,
        strategy=QuantStrategy.SYMMETRIC))
    bl = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)
    f = jax.jit(lambda q: quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL if causal else FULL, block_sizes=bl,
        interpret=False)[0])
    f(q)
    return f, (q,)


def slope(builder, b1=4, b2=16):
    f1, a1 = builder(b1)
    f2, a2 = builder(b2)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - b1)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    arms = [
        ("prod causal", lambda b: build_prod(d, h, b, True), 0.5),
        ("lean causal 512x512x4 c1",
         lambda b: build_lean(d, h, b, 512, 512, 4, True, 1), 0.5),
        ("lean FULL   512x512x4 c1",
         lambda b: build_lean(d, h, b, 512, 512, 4, False, 1), 1.0),
        ("prod FULL",
         lambda b: build_prod(d, h, b, False), 1.0),
        ("lean causal 1024x512x4 c2",
         lambda b: build_lean(d, h, b, 1024, 512, 4, True, 2), 0.5),
        ("lean causal 512x512x2 c1",
         lambda b: build_lean(d, h, b, 512, 512, 2, True, 1), 0.5),
    ]
    for name, builder, frac in arms:
        fl = 4 * h * S * S * d * frac
        try:
            sec = slope(builder)
            print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
