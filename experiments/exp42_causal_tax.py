"""exp42 (round 5): attribute the causal d=256 boundary tax (VERDICT r4
item 4).

Round-4 arithmetic: causal's 36/32 live-tile overcompute alone would cap
causal at ~146 TF/s at FULL's per-tile rate, yet flat causal sits at
113-117 — ~20% of residual tax.  Hypothesis (round-2 note): a FIXED
per-q-row-segment cost (pipeline restart + accumulator init + store
epilogue, ~4-5 µs measured at S=1024) that FULL amortizes over 8 live
steps/row but causal only over 4.5.

Method (within-run, production wrapper, folded int8 d=256 h=4):
measure FULL at Skv ∈ {1024, 2048, 4096} with Sq=4096 — same segment
count (8 rows × h × b), different steps/row (2/4/8).  Fit
t_segment = c_fix + steps·c_tile.  Predict causal S=4K (8 segments of
1..8 live steps each, 36 tiles + diagonal-tile masking) and compare to
the measured packed-pair causal.  If predicted ≈ measured, the tax IS
the short-row amortization structure — irreducible in a grid-stepped
pipeline without cross-row accumulator persistence; any remaining gap
is mask-VPU / table-read cost worth chasing.

Usage: exp42_causal_tax.py [h] [b2]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: E402
    CAUSAL, FULL,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402

SQ, D, BQ, BKV = 4096, 256, 512, 512
BLOCKS = BlockSizes(block_q=BQ, block_kv=BKV, block_kv_major=2048)


def build(h, b, skv, mask):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, SQ, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, skv, D), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, skv, D), jnp.float32)
    kq = quantize(k, QuantConfig(
        bits=8, granularity=QuantGranularity.TENSOR,
        strategy=QuantStrategy.SYMMETRIC))
    vq = quantize(v, QuantConfig(
        bits=8, granularity=QuantGranularity.CHANNEL,
        strategy=QuantStrategy.SYMMETRIC))
    fj = jax.jit(lambda q, kq, vq: quantized_flash_attention_forward(
        q, kq, vq, mask=mask, block_sizes=BLOCKS, interpret=False)[0])
    f = lambda q: fj(q, kq, vq)  # noqa: E731
    f(q)
    return f, q


def slope(h, skv, mask, b1=4, b2=16):
    f1, q1 = build(h, b1, skv, mask)
    f2, q2 = build(h, b2, skv, mask)
    t1 = min(measure(f1, q1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, q2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - b1)


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    b2 = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_rows = SQ // BQ  # segments per (b, h)

    pts = []
    for skv in (1024, 2048, 4096):
        sec = slope(h, skv, FULL, b2=b2)
        steps = skv // BKV
        t_seg = sec / (h * n_rows)
        pts.append((steps, t_seg))
        fl = 4 * h * SQ * skv * D
        print(f"FULL Skv={skv}: {fl/sec/1e12:6.1f} TF/s  "
              f"t_seg {t_seg*1e6:6.2f} us ({steps} steps/row)", flush=True)

    # Least-squares line t_seg = c_fix + steps * c_tile.
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    c_tile = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    c_fix = (sy - c_tile * sx) / n
    print(f"fit: c_fix {c_fix*1e6:.2f} us/segment, "
          f"c_tile {c_tile*1e6:.2f} us/tile", flush=True)

    # Causal prediction: 8 segments with 1..8 live steps (packed-pair
    # schedule — zero dead steps), 36 live tiles total per (b, h).
    live_tiles = n_rows * (n_rows + 1) // 2
    t_pred = h * (n_rows * c_fix + live_tiles * c_tile)
    sec_causal = slope(h, SQ, CAUSAL, b2=b2)
    fl_c = 4 * h * SQ * SQ * D // 2
    print(f"causal measured: {fl_c/sec_causal/1e12:6.1f} TF/s  "
          f"({sec_causal*1e3:.3f} ms/b)", flush=True)
    print(f"causal predicted from FULL fit: {fl_c/t_pred/1e12:6.1f} TF/s "
          f"({t_pred*1e3:.3f} ms/b)  "
          f"residual {100*(sec_causal-t_pred)/t_pred:+.1f}%", flush=True)
    print(
        "interpretation: residual ~0 => the causal gap IS the short-row "
        "amortization structure (c_fix per segment); residual >> 0 => "
        "mask-VPU/table cost still on the table.", flush=True,
    )


if __name__ == "__main__":
    main()
