"""Paged-decode regime sweep: page size × pool dtype, slope-timed.

The wave decode kernel issues one async copy per page (~0.25 us issue
regardless of bytes): small pages are ISSUE-bound (int8 can't win time),
large pages are BANDWIDTH-bound (int8 halves the bytes).  Run SOLO on
TPU.  Args: [skv]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.serving.paged_attention import (  # noqa: E402
    paged_decode_attention,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

HQ = HKV = 8
D = 128


def build(b, skv, pt, int8):
    pps = skv // pt
    np_ = b * pps + 1
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    q = jax.random.normal(ks[0], (b, HQ, D), jnp.bfloat16)
    kvp = jax.random.normal(ks[1], (HKV, np_, 2 * pt, D), jnp.bfloat16)
    rng = np.random.default_rng(0)
    # DISJOINT page sets per sequence (shared pages let HBM reads hit
    # cache and overstate GB/s).
    perm = rng.permutation(np_ - 1)
    pts_ = jnp.asarray(
        np.stack([perm[i * pps:(i + 1) * pps] for i in range(b)]).astype(
            np.int32)
    )
    lengths = jnp.full((b,), skv, jnp.int32)
    if int8:
        kvq = jnp.clip(
            jnp.round(kvp.astype(jnp.float32) * 10.0), -127, 127
        ).astype(jnp.int8)
        sc = jnp.full((HKV, np_, 1, pt), 0.1, jnp.float32)
        f = jax.jit(lambda q, kvq, sc: paged_decode_attention(
            q, kvq, pts_, lengths, page_tokens=pt, k_scales=sc,
            v_scales=sc))
        args = (q, kvq, sc)
    else:
        f = jax.jit(lambda q, kvp: paged_decode_attention(
            q, kvp, pts_, lengths, page_tokens=pt))
        args = (q, kvp)
    f(*args)
    return f, args


def slope(skv, pt, int8, b1=4, b2=16):
    f1, a1 = build(b1, skv, pt, int8)
    f2, a2 = build(b2, skv, pt, int8)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - b1)


def main():
    skv = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    kv_bytes = 2 * skv * HKV * D * 2  # bf16
    for pt in (128, 256, 512):
        try:
            t_bf = slope(skv, pt, False)
            t_i8 = slope(skv, pt, True)
        except Exception as e:  # noqa: BLE001
            print(f"pt={pt} FAILED {str(e)[:90]}", flush=True)
            continue
        print(
            f"pt={pt:4d}  bf16 {t_bf * 1e6:7.1f} us/seq "
            f"({kv_bytes / t_bf / 1e9:6.1f} GB/s)   "
            f"int8 {t_i8 * 1e6:7.1f} us/seq   speedup {t_bf / t_i8:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
