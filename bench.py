"""Headline benchmark — prints ONE JSON line for the driver.

Measures causal flash-attention forward TFLOPs/chip on real hardware at the
reference's headline regime (seq 4K, head dim 64 — BASELINE.json configs),
using the reference's own op-count model (``README.md:197-213``:
(2D+5)·N² FMA = 2·(2D+5)·N² FLOPs) so utilization fractions are comparable.

``vs_baseline`` = our fraction-of-roofline ÷ the reference's 83% sustained
ALU fraction on its hardware (``README.md:104``) — i.e. >1.0 means this
framework runs closer to ITS roofline than the reference runs to its own.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.utils.roofline import (
    attention_flops,
    detect_chip,
)

REFERENCE_ALU_FRACTION = 0.83  # README.md:104 — 4400/5308 GINSTR/s on M1 Max


def main():
    b, h, s, d = 4, 8, 4096, 64
    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), dtype)
    k = jax.random.normal(ks[1], (b, h, s, d), dtype)
    v = jax.random.normal(ks[2], (b, h, s, d), dtype)

    @jax.jit
    def fwd(q, k, v):
        o, _ = flash_attention_forward(q, k, v, mask=CAUSAL, interpret=False)
        return o

    sec = measure(fwd, q, k, v, iters=50, warmup=5)
    # Causal = half the dense op count.
    flops = attention_flops(s, s, d, num_heads=h, batch=b) / 2
    tf = flops / sec / 1e12
    chip = detect_chip()
    util = tf / chip.bf16_tflops
    print(
        json.dumps(
            {
                "metric": f"causal flash-attn fwd bf16 B{b} H{h} S{s} D{d} ({chip.name})",
                "value": round(tf, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(util / REFERENCE_ALU_FRACTION, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
