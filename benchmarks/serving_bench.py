"""Serving-engine throughput: continuous-batching decode + chunked prefill.

python benchmarks/serving_bench.py [--suite] [--mla] [--quantized-cache]
                                   [--w8a8] [--decode 64]

--suite (default when no model flags given): gqa float, gqa + int8 cache,
gqa + W8A8 weights, mla, mla + int8 latent cache — one row each in
serving.json.

Measures end-to-end tokens/second through the ServingEngine (C++ scheduler
+ paged KV cache + ragged decode kernels) under a mixed workload — the
serving analog of the reference's ``QuantizedAttention.benchmark()``.
Reports prefill tokens/s, decode tokens/s, and steady-state batch
occupancy.  Writes benchmarks/serving.json.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mla", action="store_true")
    ap.add_argument("--quantized-cache", action="store_true")
    ap.add_argument("--w8a8", action="store_true",
                    help="int8 weights via quantize_weights")
    ap.add_argument("--suite", action="store_true")
    ap.add_argument("--single", action="store_true",
                    help="internal: run exactly this config")
    ap.add_argument("--decode", type=int, default=64,
                    help="new tokens per request")
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=256)
    args = ap.parse_args()

    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        print(json.dumps({"error": "native runtime unavailable"}))
        return

    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    if not args.single and (
        args.suite or not (args.mla or args.quantized_cache or args.w8a8)
    ):
        rows = []
        base = [sys.executable, __file__]
        import subprocess

        for extra, name in (
            ([], "gqa"),
            (["--quantized-cache"], "gqa+int8cache"),
            (["--w8a8"], "gqa+w8a8"),
            (["--mla"], "mla"),
            (["--mla", "--quantized-cache"], "mla+int8latent"),
        ):
            r = subprocess.run(
                base + extra + ["--single", "--decode", str(args.decode),
                                "--requests", str(args.requests),
                                "--prompt", str(args.prompt)],
                capture_output=True, text=True,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                rows.append({"config": name, "error": r.stderr[-300:]})
            print(line or r.stderr[-200:], flush=True)
        Path(__file__).with_name("serving.json").write_text(
            json.dumps(rows, indent=1)
        )
        return

    if args.mla:
        from metal_flash_attention_plus_tpu.models.mla_transformer import (
            MLAConfig,
            init_mla_params,
        )
        from metal_flash_attention_plus_tpu.serving.engine import mla_executor

        cfg = MLAConfig(
            vocab_size=32768, d_model=1024, num_layers=4, num_heads=8,
            head_dim=64, latent_dim=256, rope_dim=32, d_ff=2048,
            max_seq=4096, dtype=jnp.bfloat16,
        )
        params = init_mla_params(cfg, jax.random.PRNGKey(0))
        executor = mla_executor()
    else:
        from metal_flash_attention_plus_tpu.models.transformer import (
            TransformerConfig,
            init_params,
        )

        cfg = TransformerConfig(
            vocab_size=32768, d_model=1024, num_layers=4, num_heads=16,
            num_kv_heads=4, head_dim=64, d_ff=2048, max_seq=4096,
            dtype=jnp.bfloat16,
        )
        params = init_params(cfg, jax.random.PRNGKey(0))
        if args.w8a8:
            from metal_flash_attention_plus_tpu.models.quantized_inference import (  # noqa: E501
                quantize_weights,
            )

            params = quantize_weights(params)
        executor = None

    def run_once():
        engine = ServingEngine(
            params, cfg, num_pages=512, page_tokens=64,
            max_batch=args.requests, chunk_size=128,
            quantized_cache=args.quantized_cache,
            **({"executor": executor} if executor else {}),
        )
        key = jax.random.PRNGKey(1)
        total_prompt = 0
        for rid in range(args.requests):
            key, k = jax.random.split(key)
            n = int(args.prompt * (0.5 + (rid % 4) / 4))  # mixed lengths
            toks = jax.random.randint(k, (n,), 0, cfg.vocab_size)
            total_prompt += n
            engine.submit(GenerationRequest(
                rid, [int(t) for t in toks], max_new_tokens=args.decode
            ))
        t0 = time.perf_counter()
        out = engine.run()
        wall = time.perf_counter() - t0
        return total_prompt, sum(len(v) for v in out.values()), wall

    run_once()  # compile prefill-chunk + decode-step programs
    total_prompt, total_new, wall = run_once()

    result = {
        "model": "mla" if args.mla else "gqa",
        "w8a8_weights": bool(args.w8a8),
        "quantized_cache": bool(args.quantized_cache),
        "requests": args.requests,
        "prompt_tokens": total_prompt,
        "new_tokens": total_new,
        "wall_s": round(wall, 3),
        "tokens_per_s": round((total_prompt + total_new) / wall, 1),
        "decode_tokens_per_s": round(total_new / wall, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
