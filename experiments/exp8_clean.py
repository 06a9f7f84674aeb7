"""Clean solo re-measurement: float defaults + quantized config sweep."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward, BlockSizes,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize

B, S = 4, 4096


def run_float():
    cases = [
        (64, 8, True, [(512, 512, 4096), (1024, 1024, 2048)]),
        (64, 8, False, [(1024, 1024, 2048), (512, 1024, 2048)]),
        (128, 8, True, [(512, 512, 4096), (512, 512, 2048)]),
        (128, 8, False, [(512, 512, 4096)]),
        (256, 4, True, [(1024, 512, 1024), (512, 512, 1024),
                        (512, 1024, 2048), (512, 512, 2048)]),
        (256, 4, False, [(1024, 512, 1024), (512, 512, 2048)]),
    ]
    for d, h, causal, cfgs in cases:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)
        mask = CAUSAL if causal else FULL
        flops = 2 * 2 * B * h * S * S * d * (0.5 if causal else 1.0)
        for (bq, bkv, bkvm) in cfgs:
            try:
                bs = BlockSizes(block_q=bq, block_kv=bkv,
                                block_kv_major=bkvm)
                f = jax.jit(lambda q, k, v, bs=bs:
                            flash_attention_forward(
                                q, k, v, mask=mask, block_sizes=bs,
                                interpret=False)[0])
                f(q, k, v)
                t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
                print(f"float d={d} c={int(causal)} ({bq},{bkv},M{bkvm}) "
                      f"{flops/t/1e12:7.1f} TF/s")
            except Exception as e:
                print(f"  float d={d} c={causal} ({bq},{bkv},M{bkvm}): "
                      f"{type(e).__name__}: {str(e)[:70]}")
            sys.stdout.flush()


def run_quant():
    for d, h, bits in ((64, 8, 8), (128, 8, 8), (256, 4, 4)):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, h, S, d), jnp.float32)
        v = jax.random.normal(ks[2], (B, h, S, d), jnp.float32)
        cfg = QuantConfig(bits=bits, granularity=QuantGranularity.ROW,
                          strategy=QuantStrategy.CENTERED)
        kq, vq = quantize(k, cfg), quantize(v, cfg)
        flops = 2 * 2 * B * h * S * S * d * 0.5
        for (bq, bkv, bkvm) in ((1024, 1024, 0), (1024, 1024, 2048),
                                (1024, 512, 1024), (512, 512, 2048),
                                (1024, 512, 2048)):
            try:
                bs = BlockSizes(block_q=bq, block_kv=bkv,
                                block_kv_major=bkvm)
                f = jax.jit(lambda q, bs=bs:
                            quantized_flash_attention_forward(
                                q, kq, vq, mask=CAUSAL, block_sizes=bs,
                                interpret=False)[0])
                f(q)
                t = measure(f, q, iters=30, warmup=3, trains=5)
                print(f"int{bits}-KV d={d} c=1 ({bq},{bkv},M{bkvm}) "
                      f"{flops/t/1e12:7.1f} TF/s")
            except Exception as e:
                print(f"  int{bits} d={d} ({bq},{bkv},M{bkvm}): "
                      f"{type(e).__name__}: {str(e)[:70]}")
            sys.stdout.flush()


if __name__ == "__main__":
    run_float()
    run_quant()
