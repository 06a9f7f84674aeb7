"""Slope-based block sweep: causal + full fwd, flat vs packed.

Every rate is a two-point batch slope (intercept-free steady state).
Run SOLO on the TPU.  Args: [mask] [d]
"""
import os
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

S = 4096


def build(d, h, mask, bq, bkv, mj, b, flat):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.bfloat16)
    bl = BlockSizes(block_q=bq, block_kv=bkv, block_kv_major=mj)
    if flat:
        os.environ.pop("MFA_NO_FLAT", None)
    else:
        os.environ["MFA_NO_FLAT"] = "1"
    f = jax.jit(lambda q, k, v: flash_attention_forward(
        q, k, v, mask=mask, block_sizes=bl, interpret=False)[0])
    f(q, k, v)
    os.environ.pop("MFA_NO_FLAT", None)
    return f, (q, k, v)


def slope(d, h, mask, bq, bkv, mj, flat, b1=4, b2=16):
    try:
        f1, a1 = build(d, h, mask, bq, bkv, mj, b1, flat)
        f2, a2 = build(d, h, mask, bq, bkv, mj, b2, flat)
        t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
                 for _ in range(2))
        t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
                 for _ in range(2))
    except Exception as e:  # noqa: BLE001
        print(f"({bq},{bkv},M{mj}) {'flat' if flat else 'pack'} "
              f"FAILED {str(e)[:90]}")
        return
    frac = 0.5 if mask is CAUSAL else 1.0
    fl = 4 * h * S * S * d * frac
    rate = fl * (b2 - b1) / (t2 - t1)
    print(f"({bq},{bkv},M{mj}) {'flat' if flat else 'pack'}  "
          f"{rate / 1e12:6.1f} TF/s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "causal"
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    h = {64: 8, 128: 8, 256: 4}[d]
    mask = CAUSAL if which == "causal" else FULL
    cfgs = [
        (512, 512, 1024), (1024, 512, 1024), (512, 512, 2048),
        (512, 512, 512), (256, 512, 1024), (1024, 512, 2048),
    ]
    for bq, bkv, mj in cfgs:
        for flat in (True, False):
            slope(d, h, mask, bq, bkv, mj, flat)


if __name__ == "__main__":
    main()
