"""exp46 (round 5): packed d=64 graded arm — block_kv micro-sweep.

The packed-API block sweep (exp39/exp40) fixed bq: (1024,512,M1024) 70.6
beat (512,512,M1024) 66.0, and bq=2048 / major=2048 crash Mosaic for the
packed body.  The kv axis was never swept: this measures block_kv 256 /
512 (ctl) / 1024 and major 512 at the pinned bq=1024 through the
production packed forward (split-PV), FULL d=64 S=4K h=8, b-slope 4/16,
within-run.
"""
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
    pack_heads,
    quantized_flash_attention_forward_packed,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402

enable_persistent_cache()
S, D, H = 4096, 64, 8


def build_arm(blocks):
    def build(b):
        def _gen(key):
            ks = jax.random.split(key, 3)
            q = jax.random.normal(ks[0], (b, H, S, D), jnp.bfloat16)
            k = jax.random.normal(ks[1], (b, H, S, D), jnp.float32)
            v = jax.random.normal(ks[2], (b, H, S, D), jnp.float32)
            kq = quantize(k, QuantConfig(
                bits=8, granularity=QuantGranularity.CHANNEL,
                strategy=QuantStrategy.SYMMETRIC))
            vq = quantize(v, QuantConfig(
                bits=8, granularity=QuantGranularity.CHANNEL,
                strategy=QuantStrategy.SYMMETRIC))
            return pack_heads(q), kq, vq

        qp, kq, vq = jax.jit(_gen)(jax.random.PRNGKey(0))
        fj = jax.jit(lambda qp, kq, vq: quantized_flash_attention_forward_packed(
            qp, kq, vq, mask=FULL, block_sizes=blocks, interpret=False)[0])
        f = lambda qp: fj(qp, kq, vq)  # noqa: E731
        f(qp)
        return f, qp

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
    fl = 4 * H * S * S * D
    arms = (
        ("bkv512 M1024 (ctl)", BlockSizes(1024, 512, block_kv_major=1024)),
        ("bkv256 M1024", BlockSizes(1024, 256, block_kv_major=1024)),
        ("bkv1024 M1024", BlockSizes(1024, 1024, block_kv_major=1024)),
        ("bkv512 M512", BlockSizes(1024, 512, block_kv_major=512)),
    )
    for name, blk in arms:
        try:
            sec = slope(build_arm(blk), 16, 10)
            print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001 — arm-tolerant sweep
            print(f"{name}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]})", flush=True)


if __name__ == "__main__":
    main()
