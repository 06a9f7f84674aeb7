"""Measure the splash-style dual-path (interior slabs skip masking).

Pre-dual-path reference numbers (docs/perf_notes.md, packed schedule):
causal fwd d64/128/256 ~ 26-30 / 57 / 72-81 TF/s; fwd+bwd 57/72 TF/s.
Run SOLO (one process, no concurrent host work).
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.attention.tuning import AttentionTuner
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward, flash_attention, BlockSizes,
)
from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
    flash_attention_backward,
)

B, S = 4, 4096


def run_fwd():
    tuner = AttentionTuner()
    for d, h in ((64, 8), (128, 8), (256, 4)):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)
        flops = 2 * 2 * B * h * S * S * d * 0.5
        cfgs = {(None, None, None)}  # tuner default
        for bq in (512, 1024):
            for bkv in (512, 1024):
                for bkvm in (2048, 4096):
                    if bkvm >= bkv:
                        cfgs.add((bq, bkv, bkvm))
        for (bq, bkv, bkvm) in sorted(
            cfgs, key=lambda t: (t[0] is None, t)
        ):
            try:
                if bq is None:
                    bs = tuner.recommend("fwd", d, 4096, causal=True)
                    tag = f"default({bs.block_q},{bs.block_kv},M{bs.block_kv_major})"
                else:
                    bs = BlockSizes(block_q=bq, block_kv=bkv,
                                    block_kv_major=bkvm)
                    tag = f"({bq},{bkv},M{bkvm})"
                f = jax.jit(lambda q, k, v, bs=bs:
                            flash_attention_forward(
                                q, k, v, mask=CAUSAL, block_sizes=bs,
                                interpret=False)[0])
                f(q, k, v)
                t = measure(f, q, k, v, iters=30, warmup=3, trains=5)
                print(f"causal-fwd d={d} {tag:28s} {flops/t/1e12:7.1f} TF/s")
            except Exception as e:
                print(f"  causal-fwd d={d} ({bq},{bkv},M{bkvm}): "
                      f"{type(e).__name__}: {str(e)[:70]}")
            sys.stdout.flush()


def run_bwd():
    for d, h in ((64, 8), (128, 8), (256, 4)):
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, h, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, h, S, d), jnp.bfloat16)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, mask=CAUSAL)
                           .astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        g(q, k, v)
        flops = 2 * B * h * S * S * d * (2 + 7) * 0.5  # fwd(2D)+bwd(7D)
        t = measure(lambda a, b, c: g(a, b, c)[0], q, k, v,
                    iters=20, warmup=3, trains=5)
        print(f"causal fwd+bwd d={d} default {flops/t/1e12:7.1f} TF/s")
        sys.stdout.flush()


if __name__ == "__main__":
    print(jax.devices())
    run_fwd()
    run_bwd()
