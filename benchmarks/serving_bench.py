"""Serving-engine throughput: continuous-batching decode + chunked prefill.

python benchmarks/serving_bench.py [--suite] [--mla] [--quantized-cache]
                                   [--int4-cache] [--w8a8] [--long]
                                   [--decode 64]

--suite (default when no model flags given): gqa float, gqa + int8 cache,
gqa + W8A8 weights, mla, mla + int8 latent cache, then the LONG-CONTEXT
rows (``--long``: ~32K-token contexts, decode-heavy, fused 8-step decode
ticks) at bf16 / int8 / int4 cache — one row each in serving.json.

Measures end-to-end tokens/second through the ServingEngine (C++ scheduler
+ paged KV cache + ragged decode kernels) — the serving analog of the
reference's ``QuantizedAttention.benchmark()``.  Every row reports overall
tokens/s, per-PHASE rates (prefill tokens/s; decode tokens/s measured over
the decode phase's own wall clock), and steady-state decode-slot occupancy
(engine.stats).  The long-context rows are the regime the quantized cache
exists for: at Skv≈32K the per-token KV read dominates, so the int8 cache's
halved bytes show up at the ENGINE level, not just the kernel level
(VERDICT r4 item 5).  Writes benchmarks/serving.json.
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
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mla", action="store_true")
    ap.add_argument("--quantized-cache", action="store_true")
    ap.add_argument("--int4-cache", action="store_true",
                    help="shared-byte int4 KV pages (4x capacity)")
    ap.add_argument("--long", action="store_true",
                    help="long-context decode-heavy workload (~32K ctx)")
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

    from metal_flash_attention_plus_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    from metal_flash_attention_plus_tpu.runtime import native_available

    if not native_available():
        print(json.dumps({"error": "native runtime unavailable"}))
        return

    from metal_flash_attention_plus_tpu.serving.engine import (
        GenerationRequest,
        ServingEngine,
    )

    if not args.single and (
        args.suite or not (args.mla or args.quantized_cache or args.w8a8
                           or args.int4_cache or args.long)
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
        # Long-context rows run in ONE process (cache modes back-to-back
        # + a bf16 repeat) so the int8/int4 ratios are within-session —
        # the tunnel's rate drifts too much across processes for
        # cross-process ratios to mean anything (docs/perf_notes.md).
        r = subprocess.run(
            base + ["--long", "--single"], capture_output=True, text=True,
        )
        for line in r.stdout.strip().splitlines():
            try:
                rows.append(json.loads(line))
                print(line, flush=True)
            except json.JSONDecodeError:
                pass
        if not r.stdout.strip():
            rows.append({"config": "gqa-32k", "error": r.stderr[-300:]})
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

    quant_mode = 4 if args.int4_cache else bool(args.quantized_cache)
    if args.long:
        # Long-context, decode-heavy: ~32K-token contexts (the VERDICT
        # r4 regime), 256-token page granularity (the bandwidth-bound
        # regime, exp26), fused 8-step decode ticks to amortize the
        # per-dispatch host cost.
        requests, prompt_n, decode_n = 4, 32256, 256
        pages_per_seq = (prompt_n + decode_n) // 256 + 1
        eng_kw = dict(
            num_pages=requests * pages_per_seq + 8, page_tokens=256,
            # 1024-token chunks: the tunnel's per-dispatch round-trip
            # (0.5-2.7 ms nominal, ~0.5 s in congestion spells) dominates
            # prefill wall — halve the dispatch count.
            max_batch=requests, chunk_size=1024,
            max_pages_per_seq=pages_per_seq,
            # 32-fused decode ticks: at ~32K context one decode step's
            # KV read is ~46 us but a tunnel dispatch is 0.5-100 ms —
            # T=32 puts kernel time back in charge of the ratio.
            quantized_cache=quant_mode, decode_steps=32,
        )
    else:
        requests, prompt_n, decode_n = args.requests, args.prompt, args.decode
        eng_kw = dict(
            num_pages=512, page_tokens=64, max_batch=requests,
            chunk_size=128, quantized_cache=quant_mode,
        )

    def run_once(warmup=False):
        engine = ServingEngine(
            params, cfg,
            **eng_kw,
            **({"executor": executor} if executor else {}),
        )
        key = jax.random.PRNGKey(1)
        total_prompt = 0
        n_req = 1 if warmup else requests
        for rid in range(n_req):
            key, k = jax.random.split(key)
            if warmup:
                # Compile-only pass: one short request exercises the
                # prefill-chunk, fused-scan, and single-step decode
                # programs (shapes are fixed by chunk_size/max_batch, so
                # the full-scale run hits a warm jit cache) without
                # paying a full-length prompt.
                n = eng_kw["chunk_size"] * 2
            elif args.long:
                n = prompt_n - 256 * (rid % 4)  # mixed, all ~32K
            else:
                n = int(prompt_n * (0.5 + (rid % 4) / 4))  # mixed lengths
            toks = jax.random.randint(k, (n,), 0, cfg.vocab_size)
            total_prompt += n
            # ONE host transfer — per-element int(t) readbacks cost a
            # device round-trip EACH (16K-token prompts hung for minutes).
            engine.submit(GenerationRequest(
                rid, np.asarray(toks).tolist(),
                max_new_tokens=(
                    eng_kw.get("decode_steps", 1) + 2 if warmup
                    else decode_n
                ),
            ))
        t0 = time.perf_counter()
        out = engine.run(max_steps=100_000)
        wall = time.perf_counter() - t0
        return total_prompt, sum(len(v) for v in out.values()), wall, engine

    def measure_mode(mode, tag):
        eng_kw["quantized_cache"] = mode
        run_once(warmup=True)  # compile prefill/decode programs cheaply
        total_prompt, total_new, wall, engine = run_once()
        st = engine.stats
        result = {
            "model": ("mla" if args.mla else "gqa") + (
                "-32k" if args.long else ""),
            "w8a8_weights": bool(args.w8a8),
            "quantized_cache": mode,
            "requests": requests,
            "prompt_tokens": total_prompt,
            "new_tokens": total_new,
            "wall_s": round(wall, 3),
            "tokens_per_s": round((total_prompt + total_new) / wall, 1),
            # Per-phase rates (engine.stats): decode tokens/s over the
            # decode phase's OWN wall clock — the number the quantized
            # cache moves.
            "prefill_tokens_per_s": round(
                st["prefill_tokens"] / max(st["prefill_s"], 1e-9), 1),
            "decode_tokens_per_s": round(
                st["decode_tokens"] / max(st["decode_s"], 1e-9), 1),
            "decode_occupancy": st["decode_occupancy"],
            "decode_steps_fused": eng_kw.get("decode_steps", 1),
            "backend": jax.default_backend(),
        }
        if tag:
            result["tag"] = tag
        print(json.dumps(result), flush=True)

    if args.long:
        # All cache modes IN ONE PROCESS plus a bf16 repeat: the tunnel's
        # rate drifts across processes, so only within-session ratios are
        # meaningful; the repeat row bounds the drift.
        measure_mode(False, "bf16")
        measure_mode(True, "int8")
        measure_mode(4, "int4")
        measure_mode(False, "bf16-repeat(drift-bound)")
    else:
        measure_mode(quant_mode, None)


if __name__ == "__main__":
    main()
