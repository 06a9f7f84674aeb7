"""A/B the static-max forward softmax (row_max="estimate") vs running max.

The static-max path removes the per-tile max reduce + alpha rescale (the
loop-carried VPU chain between the two MXU dots); its cost is one thin
sampled matmul (~nc/Skv of kernel FLOPs) + row norms, measured IN the jit.
Run SOLO.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.attention.tuning import AttentionTuner
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward, BlockSizes,
)

B, S = 4, 4096


def main():
    tuner = AttentionTuner()
    for mask, name, frac in ((CAUSAL, "causal", 0.5), (FULL, "full", 1.0)):
        for d, h in ((64, 8), (128, 8), (256, 4)):
            ks = jax.random.split(jax.random.PRNGKey(0), 3)
            q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
            k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
            v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)
            flops = 2 * 2 * B * h * S * S * d * frac
            bs = tuner.recommend(
                "fwd", d, S, causal=(mask is CAUSAL))
            for rm, tag in ((None, "running"), ("estimate", "static")):
                try:
                    f = jax.jit(
                        lambda q, k, v, bs=bs, rm=rm, mask=mask:
                        flash_attention_forward(
                            q, k, v, mask=mask, block_sizes=bs,
                            row_max=rm, interpret=False)[0])
                    f(q, k, v)
                    t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
                    print(f"{name}-fwd d={d} ({bs.block_q},{bs.block_kv},"
                          f"M{bs.block_kv_major}) {tag:8s}"
                          f" {flops/t/1e12:7.1f} TF/s")
                except Exception as e:
                    print(f"{name}-fwd d={d} {tag}: "
                          f"{type(e).__name__}: {str(e)[:90]}")
                sys.stdout.flush()


if __name__ == "__main__":
    main()
