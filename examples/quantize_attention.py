"""Example: quantized attention + GEMM workflows.

python examples/quantize_attention.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention import (
    CAUSAL,
    QuantizedAttention,
    QuantizedAttentionConfig,
)
from metal_flash_attention_plus_tpu.ops import (
    matmul,
    rotate_quantize,
    dequantize_unrotate,
    runtime_quantize,
)
from metal_flash_attention_plus_tpu.quant import capability_report
from metal_flash_attention_plus_tpu.quant.params import int8_blockwise


def main():
    print(capability_report())

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (1, 8, 1024, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 4, 1024, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 4, 1024, 64), jnp.float32)

    # Runtime-quantizing attention (int8 K/V per token).
    qa = QuantizedAttention(
        config=QuantizedAttentionConfig(key_bits=8, value_bits=8),
        mask=CAUSAL,
    )
    o = qa(q, k, v)
    print("quantized attention:", o.shape, o.dtype)

    # Built-in FP/INT8/INT4 benchmark sweep (runs on the live backend).
    results = qa.benchmark(seq_len=2048, num_heads=4, iters=10)
    for name, val in results.items():
        print(f"  {name}: {val:.3f}")

    # Weight-only quantized GEMM with blockwise compensation sums.
    a = jax.random.normal(ks[3], (512, 1024), jnp.bfloat16)
    w_t = jax.random.normal(ks[0], (2048, 1024), jnp.float32)  # [N, K]
    wq = runtime_quantize(w_t, int8_blockwise(128))
    y = matmul(a, wq)
    print("quantized matmul:", y.shape)

    # Hadamard outlier smoothing before per-tensor quantization.
    w_outliers = w_t.at[:, 3].mul(40.0)
    from metal_flash_attention_plus_tpu.quant.params import QuantConfig

    t, bs = rotate_quantize(w_outliers, QuantConfig(bits=8))
    restored = dequantize_unrotate(t, bs)
    err = float(jnp.mean(jnp.abs(restored - w_outliers)))
    print(f"rotate-quantize mean abs err: {err:.5f}")


if __name__ == "__main__":
    main()
