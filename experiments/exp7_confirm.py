"""Confirm library defaults after the two-level rework: float fwd at table
defaults, quantized bench arms, inner-skip-off check at d=256 causal."""
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.attention.tuning import default_block_sizes
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


def bench_float():
    for d, h in ((64, 8), (128, 8), (256, 4)):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)
        for causal in (True, False):
            mask = CAUSAL if causal else FULL
            flops = 2 * 2 * B * h * S * S * d * (0.5 if causal else 1.0)
            bs = default_block_sizes(d, 16, causal)
            f = jax.jit(lambda q, k, v: flash_attention_forward(
                q, k, v, mask=mask, block_sizes=bs, interpret=False)[0])
            f(q, k, v)
            t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
            print(f"float d={d} c={int(causal)} default "
                  f"{flops/t/1e12:7.1f} TF/s")
            sys.stdout.flush()


def bench_quant():
    for d, h, bits in ((64, 8, 8), (256, 4, 4), (128, 8, 8)):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, h, S, d), jnp.float32)
        v = jax.random.normal(ks[2], (B, h, S, d), jnp.float32)
        cfg = QuantConfig(bits=bits, granularity=QuantGranularity.ROW,
                          strategy=QuantStrategy.CENTERED)
        kq, vq = quantize(k, cfg), quantize(v, cfg)
        flops = 2 * 2 * B * h * S * S * d * 0.5
        fp = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            mask=CAUSAL, block_sizes=default_block_sizes(d, 16, True),
            interpret=False)[0])
        o_fp = fp(q, k, v)
        for (bq, bkv, bkvm) in ((512, 512, 4096), (512, 512, 2048),
                                (1024, 512, 1024), (512, 512, 0)):
            try:
                bs = BlockSizes(block_q=bq, block_kv=bkv,
                                block_kv_major=bkvm)
                f = jax.jit(lambda q, bs=bs:
                            quantized_flash_attention_forward(
                                q, kq, vq, mask=CAUSAL, block_sizes=bs,
                                interpret=False)[0])
                o = f(q)
                err = float(jnp.max(jnp.abs(
                    o.astype(jnp.float32) - o_fp.astype(jnp.float32))))
                t = measure(f, q, iters=30, warmup=3, trains=5)
                print(f"int{bits}-KV d={d} c=1 ({bq},{bkv},M{bkvm}) "
                      f"{flops/t/1e12:7.1f} TF/s  err={err:.3f}")
            except Exception as e:
                print(f"  int{bits} d={d} ({bq},{bkv},M{bkvm}): "
                      f"{type(e).__name__}: {str(e)[:80]}")
            sys.stdout.flush()


if __name__ == "__main__":
    bench_float()
    bench_quant()
