"""Block sweep for the flat-schedule production fwd kernel (causal+full).

Reports IDEAL TF/s (true masked flops / time).  Run SOLO on the TPU.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: E402
    CAUSAL, FULL,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes, flash_attention_forward,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

B, S = 4, 4096


def bench(d, h, mask, bq, bkv, mj):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)
    causal = mask is CAUSAL
    bl = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=mj)
    try:
        f = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k, v, mask=mask, block_sizes=bl, interpret=False)[0])
        f(q, k, v)
        t = measure(f, q, k, v, iters=30, warmup=3)
    except Exception as e:  # noqa: BLE001
        print(f"{'causal' if causal else 'full':6s} d{d:3d} "
              f"({bq},{bkv},M{mj}) FAILED {str(e)[:80]}")
        return
    flops = 4 * B * h * S * S * d * (0.5 if causal else 1.0)
    print(f"{'causal' if causal else 'full':6s} d{d:3d} ({bq},{bkv},M{mj}) "
          f"{flops / t / 1e12:7.1f} TF/s")
    sys.stdout.flush()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "causal"
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    h = {64: 8, 128: 8, 256: 4}[d]
    mask = CAUSAL if which == "causal" else FULL
    for bq in (256, 512, 1024):
        for bkv in (256, 512):
            for mj in (bkv, 2 * bkv, 4 * bkv):
                if bq * mj > 1024 * 2048:
                    continue
                bench(d, h, mask, bq, bkv, mj)


if __name__ == "__main__":
    main()
