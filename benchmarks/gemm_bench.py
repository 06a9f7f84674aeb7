"""Quantized-GEMM benchmark — LLM projection shapes on the live device.

python benchmarks/gemm_bench.py [--quick]

Measures the reference's GEMM-engine capabilities on TPU shapes:
- XLA bf16 matmul (the float path — ``ops/gemm.py`` dispatches here BY
  DESIGN; this row is the ceiling the quantized kernels are judged
  against),
- ``quantized_matmul`` weight-only int8 and int4 (dequant-on-load: the
  ``load_quantized_int8/int4`` analog; wins when the weight is
  HBM-bandwidth-bound, i.e. small M),
- ``compensated_matmul`` int8×int8→int32 MXU with zero-point compensation.

Reports TFLOP/s and effective weight-GB/s; writes benchmarks/gemm.json.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import json

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
    compensated_matmul,
    dynamic_quantized_matmul,
    quantized_matmul,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize
from metal_flash_attention_plus_tpu.utils.profiling import measure


def run_shape(m, n, k, iters):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    a = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    w = jax.random.normal(ks[1], (n, k), jnp.float32)  # Bᵀ layout [N, K]
    flops = 2.0 * m * n * k
    rows = {}

    f_bf16 = jax.jit(lambda a, w: a @ w.T.astype(jnp.bfloat16))
    sec = measure(f_bf16, a, w, iters=iters, warmup=3)
    rows["xla_bf16"] = dict(
        tflops=round(flops / sec / 1e12, 2),
        weight_gbs=round(n * k * 2 / sec / 1e9, 1),
    )

    for bits in (8, 4):
        cfg = QuantConfig(
            bits=bits, granularity=QuantGranularity.BLOCK, block_size=256
        )
        wq = quantize(w, cfg)
        f = jax.jit(lambda a: quantized_matmul(a, wq, interpret=False))
        sec = measure(f, a, iters=iters, warmup=3)
        rows[f"weight_only_int{bits}"] = dict(
            tflops=round(flops / sec / 1e12, 2),
            weight_gbs=round(wq.data.nbytes / sec / 1e9, 1),
        )

    for bits in (8, 4):
        cfg_row = QuantConfig(bits=bits, granularity=QuantGranularity.ROW)
        wq_row = quantize(w, cfg_row)
        f = jax.jit(lambda a, wq=wq_row: dynamic_quantized_matmul(
            a, wq, block_n=1024, block_k=2048
        ))
        sec = measure(f, a, iters=iters, warmup=3)
        rows[f"dynamic_w{bits}a8"] = dict(
            tflops=round(flops / sec / 1e12, 2),
            weight_gbs=round(wq_row.data.nbytes / sec / 1e9, 1),
        )

    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK, block_size=512
    )
    aq = quantize(a.astype(jnp.float32), cfg)
    wq = quantize(w, cfg)
    f = jax.jit(lambda: compensated_matmul(aq, wq, interpret=False))
    sec = measure(f, iters=iters, warmup=3)
    rows["compensated_int8xint8"] = dict(
        tflops=round(flops / sec / 1e12, 2),
        weight_gbs=round(wq.data.nbytes / sec / 1e9, 1),
    )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    iters = 10 if args.quick else 30

    results = {}
    # Decode-style (small M, weight-bound) and prefill-style (large M).
    for m, n, k in [(128, 8192, 8192), (4096, 8192, 8192)]:
        key = f"m{m}_n{n}_k{k}"
        results[key] = run_shape(m, n, k, iters)
        for name, r in results[key].items():
            print(f"{key} {name}: {r['tflops']} TF/s, "
                  f"weight {r['weight_gbs']} GB/s")
    Path(__file__).with_name("gemm.json").write_text(
        json.dumps(results, indent=1)
    )


if __name__ == "__main__":
    main()
