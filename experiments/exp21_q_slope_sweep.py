"""Slope-based block sweep for the QUANTIZED causal fwd kernels.

Args: [bits] [d].  int8 = folded TENSOR-K/CHANNEL-V; int4 = BLOCK_2D 1x32.
Run SOLO on the TPU.
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


def build(d, h, bits, bq, bkv, mj, b):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    if bits == 8:
        kq = quantize(k, QuantConfig(
            bits=8, granularity=QuantGranularity.TENSOR,
            strategy=QuantStrategy.SYMMETRIC))
        vq = quantize(v, QuantConfig(
            bits=8, granularity=QuantGranularity.CHANNEL,
            strategy=QuantStrategy.SYMMETRIC))
    else:
        cfg = QuantConfig(
            bits=4, granularity=QuantGranularity.BLOCK_2D,
            strategy=QuantStrategy.CENTERED, block_rows=1, block_size=32)
        kq = quantize(k, cfg)
        vq = quantize(v, cfg)
    bl = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=mj)
    f = jax.jit(lambda q: quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL, block_sizes=bl, interpret=False)[0])
    f(q)
    return f, (q,)


def slope(d, h, bits, bq, bkv, mj, b1=4, b2=16):
    try:
        f1, a1 = build(d, h, bits, bq, bkv, mj, b1)
        f2, a2 = build(d, h, bits, bq, bkv, mj, b2)
        t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
                 for _ in range(2))
        t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
                 for _ in range(2))
    except Exception as e:  # noqa: BLE001
        print(f"({bq},{bkv},M{mj}) FAILED {str(e)[:90]}", flush=True)
        return
    fl = 4 * h * S * S * d * 0.5
    rate = fl * (b2 - b1) / (t2 - t1)
    print(f"({bq},{bkv},M{mj})  {rate / 1e12:6.1f} TF/s", flush=True)


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    h = {64: 8, 128: 8, 256: 4}[d]
    for bq, bkv, mj in [
        (512, 512, 1024), (1024, 512, 1024), (512, 512, 2048),
        (512, 512, 512), (1024, 512, 512), (256, 512, 1024),
        (512, 256, 1024), (1024, 1024, 1024),
    ]:
        slope(d, h, bits, bq, bkv, mj)


if __name__ == "__main__":
    main()
