"""Slope-timed static-max A/B at d=64 (where exp24 shows the running-max
chain costs ~30%, unlike d>=128 where it overlaps).

Arms: running max | row_max="estimate" (in-jit estimate matmul) |
row_max=precomputed M.  Run SOLO on TPU.  Args: [d] [mask]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: E402
    CAUSAL, FULL,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes, flash_attention_forward, estimate_row_max_scaled, LOG2E,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

S, H = 4096, 8


def build(d, mask, mode, b, bq=512, bkv=512, mj=4096):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, H, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, H, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, H, S, d), jnp.bfloat16)
    bl = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=mj)
    if mode == "running":
        f = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k, v, mask=mask, block_sizes=bl, interpret=False)[0])
        args = (q, k, v)
    elif mode == "estimate":
        f = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k, v, mask=mask, block_sizes=bl, row_max="estimate",
            interpret=False)[0])
        args = (q, k, v)
    else:  # precomputed M (base-e units via row_max array input)
        scale = float(d) ** -0.5
        qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        mx = estimate_row_max_scaled(
            qs, k, mask, kv_head_of=lambda h: h, seq_q=S, seq_kv=S,
        ) / LOG2E
        f = jax.jit(lambda q, k, v, mx: flash_attention_forward(
            q, k, v, mask=mask, block_sizes=bl, row_max=mx,
            interpret=False)[0])
        args = (q, k, v, mx)
    f(*args)
    return f, args


def slope(d, mask, mode, b1=4, b2=16):
    f1, a1 = build(d, mask, mode, b1)
    f2, a2 = build(d, mask, mode, b2)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - b1)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    which = sys.argv[2] if len(sys.argv) > 2 else "causal"
    mask = CAUSAL if which == "causal" else FULL
    frac = 0.5 if which == "causal" else 1.0
    fl = 4 * H * S * S * d * frac
    # accuracy spot check (b=2, vs running)
    f_run, a_run = build(d, mask, "running", 2)
    f_est, a_est = build(d, mask, "estimate", 2)
    err = float(jnp.max(jnp.abs(
        f_run(*a_run).astype(jnp.float32)
        - f_est(*a_est).astype(jnp.float32))))
    print(f"estimate-vs-running max err: {err:.6f}", flush=True)
    for mode in ("running", "estimate", "precomp"):
        try:
            sec = slope(d, mask, mode)
            print(f"{mode:9s} {fl / sec / 1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode} FAILED {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
