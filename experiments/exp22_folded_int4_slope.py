"""Slope-based rates for the FOLDED int4/int8 paths vs BLOCK_2D, d=256.

Folded = symmetric CHANNEL K (folds into Q elementwise) + CHANNEL V
(folds at store), payload nibble-unpacked in-kernel.  Run SOLO on TPU.
Args: [d] [bits_k] [bits_v]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
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
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

S = 4096


def build(d, h, bits_k, bits_v, bq, bkv, mj, b):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    cfg = lambda bits: QuantConfig(  # noqa: E731
        bits=bits, granularity=QuantGranularity.CHANNEL,
        strategy=QuantStrategy.SYMMETRIC)
    kq, vq = quantize(k, cfg(bits_k)), quantize(v, cfg(bits_v))
    bl = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=mj)
    f = jax.jit(lambda q: quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL, block_sizes=bl, interpret=False)[0])
    f(q)
    return f, (q,)


def slope(d, h, bits_k, bits_v, bq, bkv, mj, b1=4, b2=16):
    try:
        f1, a1 = build(d, h, bits_k, bits_v, bq, bkv, mj, b1)
        f2, a2 = build(d, h, bits_k, bits_v, bq, bkv, mj, b2)
        t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
                 for _ in range(2))
        t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
                 for _ in range(2))
    except Exception as e:  # noqa: BLE001
        print(f"({bq},{bkv},M{mj}) FAILED {str(e)[:90]}", flush=True)
        return
    fl = 4 * h * S * S * d * 0.5
    rate = fl * (b2 - b1) / (t2 - t1)
    print(f"k{bits_k}v{bits_v} ({bq},{bkv},M{mj})  {rate / 1e12:6.1f} TF/s",
          flush=True)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bits_k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    bits_v = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    h = {64: 8, 128: 8, 256: 4}[d]
    for bq, bkv, mj in [
        (512, 512, 1024), (1024, 512, 1024), (1024, 512, 2048),
        (512, 512, 2048),
    ]:
        slope(d, h, bits_k, bits_v, bq, bkv, mj)


if __name__ == "__main__":
    main()
