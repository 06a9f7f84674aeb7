"""Diagnose the causal ~117 TF/s ceiling at d=256 (exp29): if FULL-mask
production arms run much faster per-FLOP, the gap is per-row pipeline
bubbles (store+init+fill at q-row boundaries), not kernel throughput.

Arms (production wrapper, h=4, d=256, S=4096):
  folded K4V8  causal | FULL
  fullint K4V8 causal | FULL
  folded K4V8  causal, out bf16 (store-bytes effect)
  folded K4V8  causal, bq=256 (more, shorter rows -> more boundaries)
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL  # noqa: E402
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

S, D, H = 4096, 256, 4
TEN, CHA = QuantGranularity.TENSOR, QuantGranularity.CHANNEL


def build(kind, mask, blocks, b, out_dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, H, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (b, H, S, D), jnp.float32)
    kq = quantize(k, QuantConfig(
        bits=4, granularity=TEN if kind == "fullint" else CHA,
        strategy=QuantStrategy.SYMMETRIC))
    vq = quantize(v, QuantConfig(
        bits=8, granularity=CHA, strategy=QuantStrategy.SYMMETRIC))
    f = jax.jit(lambda q: quantized_flash_attention_forward(
        q, kq, vq, mask=mask, block_sizes=blocks,
        quantize_q=(kind == "fullint"), out_dtype=out_dtype,
        interpret=False)[0])
    f(q)
    return f, (q,)


def slope(kind, mask, blocks, tag, out_dtype=jnp.float32, b1=4, b2=24):
    try:
        f1, a1 = build(kind, mask, blocks, b1, out_dtype)
        f2, a2 = build(kind, mask, blocks, b2, out_dtype)
        t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
                 for _ in range(2))
        t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
                 for _ in range(2))
        causal = mask is CAUSAL
        fl_per_b = 4 * H * S * S * D / (2 if causal else 1)
        rate = fl_per_b * (b2 - b1) / (t2 - t1)
        print(f"{tag:44s}: {rate / 1e12:6.1f} TF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:44s}: FAILED {type(e).__name__} {str(e)[:90]}",
              flush=True)


def main():
    m2048 = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)
    bq256 = BlockSizes(block_q=256, block_kv=256, block_kv_major=2048)
    slope("folded", CAUSAL, m2048, "folded K4V8 causal (512,512,M2048)")
    slope("folded", FULL, m2048, "folded K4V8 FULL   (512,512,M2048)")
    slope("fullint", CAUSAL, m2048, "fullint K4V8 causal (512,512,M2048)")
    slope("fullint", FULL, m2048, "fullint K4V8 FULL   (512,512,M2048)")
    slope("folded", CAUSAL, m2048,
          "folded K4V8 causal out=bf16", out_dtype=jnp.bfloat16)
    slope("folded", CAUSAL, bq256, "folded K4V8 causal (256,256,M2048)")


if __name__ == "__main__":
    main()
