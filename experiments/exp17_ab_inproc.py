"""Within-process interleaved A/B: flat vs packed causal fwd.

Toggles MFA_NO_FLAT between jit builds; measures ABAB interleaved to
cancel machine drift.  Run SOLO on the TPU.
"""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL  # noqa: E402
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes, flash_attention_forward,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

B, S = 4, 4096


def build(d, h, bq, bkv, mj, flat):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)
    bl = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=mj)
    if flat:
        os.environ.pop("MFA_NO_FLAT", None)
    else:
        os.environ["MFA_NO_FLAT"] = "1"
    f = jax.jit(lambda q, k, v: flash_attention_forward(
        q, k, v, mask=CAUSAL, block_sizes=bl, interpret=False)[0])
    f(q, k, v)  # compile now, with the env var set
    os.environ.pop("MFA_NO_FLAT", None)
    return f, (q, k, v)


def main():
    for d, h, blocks in (
        (64, 8, [(512, 512, 2048), (1024, 512, 512), (512, 512, 512)]),
        (128, 8, [(512, 512, 2048), (1024, 512, 512), (512, 512, 512)]),
        (256, 4, [(1024, 512, 1024), (512, 512, 1024), (512, 512, 512)]),
    ):
        for bq, bkv, mj in blocks:
            fa_, args = build(d, h, bq, bkv, mj, flat=True)
            fb_, _ = build(d, h, bq, bkv, mj, flat=False)
            ta = min(measure(fa_, *args, iters=30, warmup=3)
                     for _ in range(2))
            tb = min(measure(fb_, *args, iters=30, warmup=3)
                     for _ in range(2))
            flops = 4 * B * h * S * S * d * 0.5
            print(f"d{d:3d} ({bq},{bkv},M{mj})  flat "
                  f"{flops / ta / 1e12:6.1f}  packed "
                  f"{flops / tb / 1e12:6.1f} TF/s   "
                  f"ratio {tb / ta:.3f}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
