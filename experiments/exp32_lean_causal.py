"""Lean-causal kernel prototype: how much of the production kernel's
causal rate (115-117 TF/s d256 today) is recoverable by
(a) replacing the scalar-prefetch step tables with ARITHMETIC index maps
    (causal lo/hi are affine in the row index — no SMEM arrays, no
    per-step table reads),
(b) a cheaper per-row epilogue (reciprocal-multiply instead of VPU
    divide; optional L output),
(c) splitting the q-block into TWO independent softmax chains (row-pair
    interleave: one wide QK dot, two half-height VPU chains Mosaic can
    overlap; halves the row-boundary count per output block).

All variants: folded int8 KV (TENSOR-K fold in the Q pre-scale, CHANNEL-V
fold at store), causal, S=4096, bf16 q, f32 out + L — production math.
Production folded-int8 causal is the within-run control.

Usage: exp32_lean_causal.py [d] [h]
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL  # noqa: E402
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
           acc_scr, *, bq, bkv, n_inner, d, variant):
    i = pl.program_id(2)
    j = pl.program_id(3)
    bkvm = bkv * n_inner
    hi = (((i + 1) * bq) + bkvm - 1) // bkvm  # affine causal row bound

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    nchain = 2 if variant == "pair" else 1
    cq = bq // nchain

    def chain(c, s_c, t):
        # One independent online-softmax chain over rows [c*cq, (c+1)*cq).
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
        else:
            acc_scr[r, :] = acc_scr[r, :] * pltpu.repeat(
                alpha, d // LANES, axis=1) + pv

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

    bkvm_ = bkv * n_inner
    # A major slab strictly below the diagonal needs no mask pass.
    fully_live = (j + 1) * bkvm_ <= i * bq + 1

    @pl.when(jnp.logical_and(j < hi, fully_live))
    def _interior():
        for t in range(n_inner):
            inner(t, False)

    @pl.when(jnp.logical_and(j < hi, jnp.logical_not(fully_live)))
    def _edge():
        for t in range(n_inner):
            inner(t, True)

    @pl.when(j == hi - 1)
    def _store():
        lsum = l_scr[...]
        safe = jnp.where(lsum == 0.0, 1.0, lsum)
        if variant == "div":
            out = acc_scr[...] / pltpu.repeat(safe, d // LANES, axis=1)
        else:
            inv = 1.0 / safe  # [bq, LANES]
            out = acc_scr[...] * pltpu.repeat(inv, d // LANES, axis=1)
        out = out * vsc_ref[0, 0]
        o_ref[0, 0] = out.astype(o_ref.dtype)
        if variant != "nol":
            m = m_scr[...]
            l_ref[0, 0] = jnp.where(
                lsum > 0.0, m * LN2 + jnp.log(safe), NEG_INF)
        else:
            l_ref[0, 0] = m_scr[...]


def build_lean(variant, d, h, b, bq, bkv, n_inner):
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

    kern = functools.partial(
        kernel, bq=bq, bkv=bkv, n_inner=n_inner, d=d, variant=variant)
    f = pl.pallas_call(
        kern,
        grid=(b, h, ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, bkvm, d),
                lambda b, h, i, j: (b, h, jnp.minimum(j, hi_of(i) - 1), 0),
            ),
            pl.BlockSpec(
                (1, 1, bkvm, d),
                lambda b, h, i, j: (b, h, jnp.minimum(j, hi_of(i) - 1), 0),
            ),
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


def build_prod(d, h, b):
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
        q, kq, vq, mask=CAUSAL, block_sizes=bl, interpret=False)[0])
    f(q)
    return f, (q,)


def slope(builder, b1=4, b2=24):
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
    fl = 4 * h * S * S * d / 2

    sec = slope(lambda b: build_prod(d, h, b))
    print(f"prod folded int8 (512,512,M2048): {fl/sec/1e12:6.1f} TF/s",
          flush=True)
    for variant, bq, bkv, n_inner in [
        ("div", 512, 512, 4),
        ("recip", 512, 512, 4),
        ("nol", 512, 512, 4),
        ("recip", 1024, 512, 4),
        ("pair", 1024, 512, 4),
        ("pair", 1024, 512, 2),
    ]:
        try:
            sec = slope(
                lambda b: build_lean(variant, d, h, b, bq, bkv, n_inner))
            print(f"lean {variant:6s} bq{bq} bkv{bkv} x{n_inner}: "
                  f"{fl/sec/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"lean {variant:6s} bq{bq} x{n_inner}: FAILED "
                  f"{type(e).__name__} {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
