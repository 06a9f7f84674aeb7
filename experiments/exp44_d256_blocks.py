"""exp44 (round 5): d=256 graded-arm block micro-sweeps.

fwd fullint: bq 512 (pinned, exp36) vs bq 1024 — never tried under the
full-integer pipeline (exp36's bq1024 arm was folded).
fwd+bwd fullint: dq q-block 512 (current) vs 1024 (mirrors the dkv
q-block-1024 win of exp40).

Within-run slopes; warm persistent cache.
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.attention.masking import FULL  # noqa: E402
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_flash_attention,
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402
from metal_flash_attention_plus_tpu.utils.roofline import (  # noqa: E402
    attention_ginstrs,
)

enable_persistent_cache()
S, D, H = 4096, 256, 4


def gen(b, with_do=False):
    def _g(key):
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (b, H, S, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, H, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (b, H, S, D), jnp.float32)
        do = jax.random.normal(ks[3], (b, H, S, D), jnp.bfloat16)
        kq = quantize(k, QuantConfig(
            bits=8, granularity=QuantGranularity.ROW,
            strategy=QuantStrategy.SYMMETRIC))
        vq = quantize(v, QuantConfig(
            bits=8, granularity=QuantGranularity.CHANNEL,
            strategy=QuantStrategy.SYMMETRIC))
        return q, kq, vq, do

    return jax.jit(_g)(jax.random.PRNGKey(0))


def fwd_arm(blocks):
    def build(b):
        q, kq, vq, _ = gen(b)
        fj = jax.jit(lambda q, kq, vq: quantized_flash_attention_forward(
            q, kq, vq, mask=FULL, block_sizes=blocks,
            quantize_q=True, interpret=False)[0])
        f = lambda q: fj(q, kq, vq)  # noqa: E731
        f(q)
        return f, q

    return build


def bwd_arm(blocks):
    def build(b):
        q, kq, vq, do = gen(b, True)

        def loss(q, ks_, vs_, kq, vq, do):
            kq = dataclasses.replace(kq, scale=ks_)
            vq = dataclasses.replace(vq, scale=vs_)
            return jnp.sum(
                quantized_flash_attention(
                    q, kq, vq, mask=FULL, block_sizes=blocks,
                    quantize_q=True, bwd_fullint=True,
                ).astype(jnp.float32) * do.astype(jnp.float32))

        fj = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        f = lambda q: fj(q, kq.scale, vq.scale, kq, vq, do)  # noqa: E731
        f(q)
        return f, q

    return build


def slope(build, b2, iters):
    f1, a1 = build(4)
    f2, a2 = build(b2)
    t1 = min(measure(f1, a1, iters=iters, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, a2, iters=iters, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - 4)


def main():
    b512 = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)
    b1024 = BlockSizes(block_q=1024, block_kv=512, block_kv_major=2048)
    fl = 4 * H * S * S * D
    import os
    for name, blk in (("fwd fullint bq512 (ctl)", b512),
                      ("fwd fullint bq1024", b1024)):
        if os.environ.get("MFA_EXP44_SKIP_FWD"):
            break
        try:
            sec = slope(fwd_arm(blk), 16, 10)
            print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001 — arm-tolerant sweep
            # Measured 2026-08-21: bq1024 under fullint VMEM-OOMs
            # (scoped 16.36M > 16M) — infeasible, bq512 stands.
            print(f"{name}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]})", flush=True)

    def bwd_blocks(qdq):
        return BlockSizes(
            block_q=512, block_kv=512, block_kv_major=2048,
            block_q_dq=qdq, block_kv_dq=512, block_kv_dq_major=2048,
            block_q_dkv=1024, block_kv_dkv=512, block_q_dkv_major=2048,
        )

    flb = 2.0 * attention_ginstrs(S, S, D, num_heads=H, batch=1,
                                  phase="fwd_bwd")
    for name, blk in (("fwd+bwd dq-q512 (ctl)", bwd_blocks(512)),
                      ("fwd+bwd dq-q1024", bwd_blocks(1024))):
        try:
            sec = slope(bwd_arm(blk), 12, 8)
            print(f"{name}: {flb/sec/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]})", flush=True)


if __name__ == "__main__":
    main()
