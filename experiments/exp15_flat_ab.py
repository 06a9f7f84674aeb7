"""A/B: production fwd kernel flat vs packed/dense schedules on TPU.

Usage: python exp15_flat_ab.py            (flat — default)
       MFA_NO_FLAT=1 python exp15_flat_ab.py   (old schedule)
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: E402
    CAUSAL, FULL,
)
from metal_flash_attention_plus_tpu.attention.tuning import (  # noqa: E402
    AttentionTuner,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

B, S = 4, 4096


def bench(d, h, mask, name):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)
    causal = mask is CAUSAL
    bl = AttentionTuner.shared().recommend("fwd", d, S, causal=causal)
    f = jax.jit(lambda q, k, v: flash_attention_forward(
        q, k, v, mask=mask, block_sizes=bl, interpret=False)[0])
    f(q, k, v)
    t = measure(f, q, k, v, iters=30, warmup=3)
    flops = 4 * B * h * S * S * d * (0.5 if causal else 1.0)
    print(f"{name:12s} d{d:3d}  {flops / t / 1e12:7.1f} TF/s")
    sys.stdout.flush()


def main():
    for d, h in ((64, 8), (128, 8), (256, 4)):
        bench(d, h, FULL, "full")
        bench(d, h, CAUSAL, "causal")


if __name__ == "__main__":
    main()
