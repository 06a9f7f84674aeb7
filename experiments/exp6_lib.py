"""Validate the rewritten LIBRARY forward kernel on TPU and sweep
(block_q, block_kv, block_kv_major) for the tuning tables."""
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward, BlockSizes,
)
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
)

B, H, S = 4, 8, 4096


def main():
    for d in (64, 128, 256):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, S, d), jnp.bfloat16)
        # small-shape correctness gate vs dense reference
        qs, ks_, vs = (x[:1, :2, :512] for x in (q, k, v))
        for causal in (True, False):
            mask = CAUSAL if causal else FULL
            o_ref, l_ref = reference_attention(
                qs.astype(jnp.float32), ks_.astype(jnp.float32),
                vs.astype(jnp.float32), mask=mask)
            flops = 2 * 2 * B * H * S * S * d * (0.5 if causal else 1.0)
            cfgs = [
                (512, 512, 0),       # single-level (old default)
                (512, 512, 1024),
                (512, 512, 2048),
                (512, 512, 4096),
                (1024, 1024, 2048),
                (512, 1024, 2048),
                (1024, 512, 1024),
            ]
            if d == 256:
                cfgs = [c for c in cfgs if c[2] <= 2048]
            for (bq, bkv, bkvM) in cfgs:
                try:
                    bs = BlockSizes(block_q=bq, block_kv=bkv,
                                    block_kv_major=bkvM)
                    f = jax.jit(lambda q, k, v, bs=bs:
                                flash_attention_forward(
                                    q, k, v, mask=mask, block_sizes=bs,
                                    interpret=False)[0])
                    # correctness on the small slice
                    o_s, l_s = jax.jit(
                        lambda q, k, v, bs=bs: flash_attention_forward(
                            q, k, v, mask=mask, block_sizes=bs,
                            interpret=False))(qs, ks_, vs)
                    err = float(jnp.max(jnp.abs(
                        o_s.astype(jnp.float32) - o_ref)))
                    lerr = float(jnp.max(jnp.abs(l_s - l_ref)))
                    tag = f"  ERR o={err:.3g} l={lerr:.3g}" \
                        if (err > 5e-2 or lerr > 7e-3) else ""
                    f(q, k, v)
                    t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
                    print(f"d={d} c={int(causal)} ({bq},{bkv},M{bkvM}) "
                          f"{flops/t/1e12:7.1f} TF/s{tag}")
                except Exception as e:
                    print(f"  ({bq},{bkv},M{bkvM}) d={d} c={causal}: "
                          f"{type(e).__name__}: {str(e)[:90]}")
                sys.stdout.flush()


if __name__ == "__main__":
    main()
