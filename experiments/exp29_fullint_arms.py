"""Production-kernel A/B: folded vs FULL-INTEGER arms at the bench shapes.

exp28 ladder (FULL mask): fullint (running max) = 1.24x base16 at d=256;
local-max helps only d=64.  This measures the production wrapper at the
GRADED causal shapes with the real quant configs + errors:

d=256 h=4:  folded K4V8 (current arm) | fullint K8V8 | fullint K4V8
d=64  h=8:  folded K8 (current arm)   | fullint K8V8

Each fullint arm tries both the int8 and the float block tables.
Interleaved A/B within one process; two-point batch slopes.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL  # noqa: E402
from metal_flash_attention_plus_tpu.attention.tuning import (  # noqa: E402
    AttentionTuner,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes,
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

S = 4096


def cfg(bits, gran):
    return QuantConfig(
        bits=bits, granularity=gran, strategy=QuantStrategy.SYMMETRIC,
    )


TEN, CHA = QuantGranularity.TENSOR, QuantGranularity.CHANNEL


def build(d, h, arm, blocks, b):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    kind, bk, bv = arm
    kq = quantize(k, cfg(bk, TEN if kind == "fullint" or bk == 8 else CHA))
    if kind == "folded" and bk == 4:
        kq = quantize(k, cfg(4, CHA))
    vq = quantize(v, cfg(bv, CHA))
    f = jax.jit(lambda q: quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL, block_sizes=blocks,
        quantize_q=(kind == "fullint"), interpret=False)[0])
    o = f(q)
    return f, (q,), (o, q, k, v)


def err_vs_fp32(o, q, k, v, blocks):
    fp = jax.jit(lambda q, k, v: flash_attention_forward(
        q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        mask=CAUSAL, interpret=False)[0])
    o_fp = fp(q, k, v)
    return float(jnp.max(jnp.abs(
        o.astype(jnp.float32) - o_fp.astype(jnp.float32))))


def slope(d, h, arm, blocks, b1=4, b2=24):
    f1, a1, chk = build(d, h, arm, blocks, b1)
    f2, a2, _ = build(d, h, arm, blocks, b2)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    fl_per_b = 4 * h * S * S * d / 2
    rate = fl_per_b * (b2 - b1) / (t2 - t1)
    err = err_vs_fp32(*chk, blocks)
    return rate / 1e12, err


def main():
    t = AttentionTuner.shared()
    bl_f256 = t.recommend("fwd", 256, S, causal=True)
    bl_q4 = t.recommend("fwd_q", 256, S, bits=4)
    bl_q8_256 = t.recommend("fwd_q", 256, S, bits=8)
    bl_f64 = t.recommend("fwd", 64, S, causal=True)
    bl_q8_64 = t.recommend("fwd_q", 64, S, bits=8)

    runs = [
        (256, 4, ("folded", 4, 8), bl_q4, "folded K4V8 (q4 tbl)"),
        (256, 4, ("fullint", 4, 8), bl_q4, "fullint K4V8 (q4 tbl)"),
        (256, 4, ("fullint", 4, 8), bl_f256, "fullint K4V8 (f tbl)"),
        (256, 4, ("fullint", 8, 8), bl_q8_256, "fullint K8V8 (q8 tbl)"),
        (256, 4, ("fullint", 4, 4), bl_q4, "fullint K4V4 (q4 tbl)"),
        (64, 8, ("folded", 8, 8), bl_f64, "folded K8V8 (f tbl)"),
        (64, 8, ("fullint", 8, 8), bl_q8_64, "fullint K8V8 (q8 tbl)"),
        (64, 8, ("fullint", 8, 8), bl_f64, "fullint K8V8 (f tbl)"),
    ]
    for d, h, arm, blocks, tag in runs:
        try:
            tf, err = slope(d, h, arm, blocks)
            print(f"d{d:3d} {tag:24s} blocks({blocks.block_q},"
                  f"{blocks.block_kv},M{blocks.kv_major}): "
                  f"{tf:6.1f} TF/s  err {err:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"d{d:3d} {tag:24s} FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
