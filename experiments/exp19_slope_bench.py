"""Two-point batch-slope measurement of the headline arms.

rate = flops(B2 - B1) / (t(B2) - t(B1)) cancels the tunnel's fluctuating
0.45-0.9 ms per-dispatch cost (measured: trivial x+1 jit call is 446-824
us depending on the hour).  Matches the reference's methodology (many
duplicated dispatches inside one timed command buffer).
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


def build(d, h, bits, B):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, h, S, d), jnp.float32)
    if bits == 0:
        bl = AttentionTuner.shared().recommend("fwd", d, S, causal=True)
        f = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            mask=CAUSAL, block_sizes=bl, interpret=False)[0])
        args = (q, k, v)
    elif bits == 8:
        kq = quantize(k, QuantConfig(
            bits=8, granularity=QuantGranularity.TENSOR,
            strategy=QuantStrategy.SYMMETRIC))
        vq = quantize(v, QuantConfig(
            bits=8, granularity=QuantGranularity.CHANNEL,
            strategy=QuantStrategy.SYMMETRIC))
        bl = AttentionTuner.shared().recommend("fwd", d, S, causal=True)
        f = jax.jit(lambda q: quantized_flash_attention_forward(
            q, kq, vq, mask=CAUSAL, block_sizes=bl, interpret=False)[0])
        args = (q,)
    else:
        cfg = QuantConfig(
            bits=4, granularity=QuantGranularity.BLOCK_2D,
            strategy=QuantStrategy.CENTERED, block_rows=1, block_size=32)
        kq = quantize(k, cfg)
        vq = quantize(v, cfg)
        bl = AttentionTuner.shared().recommend("fwd_q", d, S, bits=4)
        f = jax.jit(lambda q: quantized_flash_attention_forward(
            q, kq, vq, mask=CAUSAL, block_sizes=bl, interpret=False)[0])
        args = (q,)
    f(*args)
    return f, args


def slope(d, h, bits, b1=4, b2=24):
    f1, a1 = build(d, h, bits, b1)
    f2, a2 = build(d, h, bits, b2)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    fl_per_b = 4 * h * S * S * d / 2
    rate = fl_per_b * (b2 - b1) / (t2 - t1)
    icept = t1 - fl_per_b * b1 / rate
    tag = {0: "bf16", 8: "int8", 4: "int4"}[bits]
    print(f"d{d:3d} {tag}: slope {rate / 1e12:6.1f} TF/s  "
          f"intercept {icept * 1e6:6.0f} us  "
          f"(B4 apparent {fl_per_b * b1 / t1 / 1e12:5.1f})", flush=True)


def main():
    slope(64, 8, 8)
    slope(64, 8, 0)
    slope(256, 4, 4)
    slope(256, 4, 0)


if __name__ == "__main__":
    main()
