"""Slope rates + max_err for quantized fwd VARIANTS at one (d, blocks).

Variants: folded-chan / folded-row / folded-k4v8 / fullint (quantize_q +
int8 PxV).  Run SOLO on TPU.  Args: [d] [bits] [variant...]
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
    BlockSizes, flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

S = 4096
G = QuantGranularity
SYM = QuantStrategy.SYMMETRIC


def sym(bits, gran):
    return QuantConfig(bits=bits, granularity=gran, strategy=SYM)


def build(d, h, variant, bits, bq, bkv, mj, b):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    qq = False
    if variant == "folded-chan":
        kq, vq = quantize(k, sym(bits, G.CHANNEL)), quantize(
            v, sym(bits, G.CHANNEL))
    elif variant == "folded-row":
        kq, vq = quantize(k, sym(bits, G.ROW)), quantize(
            v, sym(bits, G.ROW))
    elif variant == "folded-k4v8":
        kq, vq = quantize(k, sym(4, G.CHANNEL)), quantize(
            v, sym(8, G.CHANNEL))
    elif variant == "fullint":
        kq, vq = quantize(k, sym(bits, G.TENSOR)), quantize(
            v, sym(bits, G.CHANNEL))
        qq = True
    elif variant == "fullint-k4v8":
        kq, vq = quantize(k, sym(4, G.TENSOR)), quantize(
            v, sym(8, G.CHANNEL))
        qq = True
    else:
        raise ValueError(variant)
    bl = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=mj)
    f = jax.jit(lambda q: quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL, block_sizes=bl, quantize_q=qq,
        interpret=False)[0])
    f(q)
    return f, q, k, v


def run(d, h, variant, bits, bq, bkv, mj, b1=4, b2=16):
    try:
        f1, q1, k, v = build(d, h, variant, bits, bq, bkv, mj, b1)
        f2, q2, _, _ = build(d, h, variant, bits, bq, bkv, mj, b2)
        fp = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            mask=CAUSAL, interpret=False)[0])
        err = float(jnp.max(jnp.abs(
            f1(q1).astype(jnp.float32) - fp(q1, k, v).astype(jnp.float32))))
        t1 = min(measure(f1, q1, iters=10, warmup=2, trains=3)
                 for _ in range(2))
        t2 = min(measure(f2, q2, iters=10, warmup=2, trains=3)
                 for _ in range(2))
    except Exception as e:  # noqa: BLE001
        print(f"{variant} ({bq},{bkv},M{mj}) FAILED {str(e)[:90]}",
              flush=True)
        return
    fl = 4 * h * S * S * d * 0.5
    rate = fl * (b2 - b1) / (t2 - t1)
    print(f"{variant:12s} b{bits} ({bq},{bkv},M{mj})  "
          f"{rate / 1e12:6.1f} TF/s  err {err:.4f}", flush=True)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    variants = sys.argv[3:] or ["folded-chan", "fullint"]
    h = {64: 8, 128: 8, 256: 4}[d]
    if d == 256:
        cfgs = [(512, 512, 2048), (512, 512, 1024)]
    else:
        cfgs = [(512, 512, 2048), (1024, 512, 1024), (512, 512, 4096),
                (1024, 1024, 2048)]
    for variant in variants:
        for bq, bkv, mj in cfgs:
            run(d, h, variant, bits, bq, bkv, mj)


if __name__ == "__main__":
    main()
