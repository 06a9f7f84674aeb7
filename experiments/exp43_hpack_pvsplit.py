"""exp43 (round 5): hpack d=64 — split-PV variant.

The packed kernel's PV path builds a block-diagonal V ([2bkv, 128] lane
concat with zero tiles) and concatenates P halves — ~2 extra VPU passes
per score tile in a VPU-bound kernel.  The PV contraction is bkv (not
d), so TWO separate dots p1·v1 / p2·v2 ([bq, bkv] × [bkv, 64]) contract
the full 512 depth each and cost the same MXU time as the one packed
dot while skipping the v_bd build AND the p concat (exp2 runs per half
directly).  QK stays packed (its win IS the full-depth contraction).

Measures prod packed kernel vs the split-PV variant, FULL d=64 S=4K h=8,
b-slope 4/16, within-run.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)
from metal_flash_attention_plus_tpu.attention.masking import FULL  # noqa: E402
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    pack_heads,
    quantized_flash_attention_forward_packed,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402

enable_persistent_cache()
S, D = 4096, 64
NEG_INF = float("-inf")
LN2 = 0.6931471805599453


def _split_kernel(q_ref, k1_ref, k2_ref, v1_ref, v2_ref, vsc_ref,
                  o_ref, l_ref, m_scr, l_scr, acc_scr, *,
                  block_q, block_kv, n_inner):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_cat = q_ref[0, 0]
    d = D

    def _inner(t):
        sl = pl.ds(t * block_kv, block_kv)
        k1 = k1_ref[0, 0, sl, :]
        k2 = k2_ref[0, 0, sl, :]
        z8 = jnp.zeros((block_kv, d), jnp.int8)
        k_bd = jnp.concatenate([
            jnp.concatenate([k1, z8], axis=1),
            jnp.concatenate([z8, k2], axis=1),
        ], axis=0)
        s = jax.lax.dot_general(
            q_cat, k_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, 2bkv]
        s1 = s[:, :block_kv]
        s2 = s[:, block_kv:]
        m_prev = m_scr[...]
        m_curr = jnp.concatenate([
            jnp.broadcast_to(
                jnp.max(s1, axis=1, keepdims=True), (block_q, d)),
            jnp.broadcast_to(
                jnp.max(s2, axis=1, keepdims=True), (block_q, d)),
        ], axis=1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        m1w = pltpu.repeat(m_next[:, :d], block_kv // d, axis=1)
        m2w = pltpu.repeat(m_next[:, d:], block_kv // d, axis=1)
        # SPLIT PV: exp2 per half, no concat; two full-depth dots into
        # lane halves of the accumulator — no block-diagonal V build.
        p1 = jnp.exp2(s1 - m1w)
        p2 = jnp.exp2(s2 - m2w)
        l_scr[...] = alpha * l_scr[...] + jnp.concatenate([
            jnp.broadcast_to(
                jnp.sum(p1, axis=1, keepdims=True), (block_q, d)),
            jnp.broadcast_to(
                jnp.sum(p2, axis=1, keepdims=True), (block_q, d)),
        ], axis=1)
        m_scr[...] = m_next
        pv1 = jax.lax.dot_general(
            p1.astype(jnp.bfloat16), v1_ref[0, 0, sl, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        pv2 = jax.lax.dot_general(
            p2.astype(jnp.bfloat16), v2_ref[0, 0, sl, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + jnp.concatenate(
            [pv1, pv2], axis=1
        )

    for t in range(n_inner):
        _inner(t)

    @pl.when(j == pl.num_programs(3) - 1)
    def _store():
        lsum = l_scr[...]
        safe = jnp.where(lsum == 0.0, 1.0, lsum)
        out = acc_scr[...] * (1.0 / safe) * vsc_ref[0, 0]
        o_ref[0, 0] = out.astype(o_ref.dtype)
        l_ref[0, 0] = jnp.where(
            lsum > 0.0, m_scr[...] * LN2 + jnp.log(safe), NEG_INF
        )


def split_forward(qp, kq, vq, vsc_cat, bq, bkv, bkvm):
    b, h2, sq, _ = qp.shape
    n_inner = bkvm // bkv
    ni, nj = sq // bq, sq // bkvm
    kv_map0 = lambda bi, p, i, j: (bi, 2 * p, j, 0)  # noqa: E731
    kv_map1 = lambda bi, p, i, j: (bi, 2 * p + 1, j, 0)  # noqa: E731
    q_map = lambda bi, p, i, j: (bi, p, i, 0)  # noqa: E731
    o, l = pl.pallas_call(
        functools.partial(
            _split_kernel, block_q=bq, block_kv=bkv, n_inner=n_inner),
        grid=(b, h2, ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1, bq, 2 * D), q_map),
            pl.BlockSpec((1, 1, bkvm, D), kv_map0),
            pl.BlockSpec((1, 1, bkvm, D), kv_map1),
            pl.BlockSpec((1, 1, bkvm, D), kv_map0),
            pl.BlockSpec((1, 1, bkvm, D), kv_map1),
            pl.BlockSpec((1, 1, 1, 2 * D),
                         lambda bi, p, i, j: (bi, p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, 2 * D), q_map),
            pl.BlockSpec((1, 1, bq, 128), q_map),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h2, sq, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((b, h2, sq, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary"),
        ),
    )(qp, kq, kq, vq, vq, vsc_cat)
    return o, l


def build(b, kind):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    h = 8

    def _gen(key):
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, h, S, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (b, h, S, D), jnp.float32)
        cfg = QuantConfig(bits=8, granularity=QuantGranularity.CHANNEL,
                          strategy=QuantStrategy.SYMMETRIC)
        return q, quantize(k, cfg), quantize(v, cfg)

    q, kq, vq = jax.jit(_gen)(jax.random.PRNGKey(0))
    qp = pack_heads(q)
    blocks = BlockSizes(block_q=1024, block_kv=512, block_kv_major=1024)
    if kind == "prod":
        fj = jax.jit(
            lambda qp, kq, vq: quantized_flash_attention_forward_packed(
                qp, kq, vq, mask=FULL, block_sizes=blocks,
                interpret=False)[0])
        f = lambda qp: fj(qp, kq, vq)  # noqa: E731
        f(qp)
        return f, qp
    # split variant: pre-scale q like the packed wrapper does (CHANNEL K
    # scales fold elementwise via the pair-concatenated vector).
    scale = D ** -0.5
    import numpy as np
    LOG2E = float(np.log2(np.e))
    h2 = h // 2
    ksr = kq.scale.reshape(b, h, D).astype(jnp.float32)
    ks_pair = jnp.stack(
        [jnp.concatenate([ksr[:, 2*p], ksr[:, 2*p+1]], axis=-1)
         for p in range(h2)], axis=1)[:, :, None, :]  # [b,h2,1,128]
    vsr = vq.scale.reshape(b, h, D).astype(jnp.float32)
    vs_pair = jnp.stack(
        [jnp.concatenate([vsr[:, 2*p], vsr[:, 2*p+1]], axis=-1)
         for p in range(h2)], axis=1)[:, :, None, :]
    qps = (qp.astype(jnp.float32) * (ks_pair * (scale * LOG2E))
           ).astype(jnp.bfloat16)
    fj = jax.jit(lambda qps, kd, vd, vs: split_forward(
        qps, kd, vd, vs, 1024, 512, 1024)[0])
    f = lambda qps: fj(qps, kq.data, vq.data, vs_pair)  # noqa: E731
    f(qps)
    return f, qps


def main():
    import numpy as np
    fl = 4 * 8 * S * S * D
    for kind in ("prod", "split"):
        try:
            f1, a1 = build(4, kind)
            f2, a2 = build(16, kind)
            t1 = min(measure(f1, a1, iters=10, warmup=2, trains=3)
                     for _ in range(2))
            t2 = min(measure(f2, a2, iters=10, warmup=2, trains=3)
                     for _ in range(2))
            sec = (t2 - t1) / 12
            print(f"{kind}: {fl/sec/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback
            print(f"{kind}: FAILED {type(e).__name__} {str(e)[:140]}")
            traceback.print_exc(limit=2)


if __name__ == "__main__":
    main()
