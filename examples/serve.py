"""Example: continuous-batching generation with the paged serving engine.

python examples/serve.py [--quantized-cache]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    init_params,
)
from metal_flash_attention_plus_tpu.serving.engine import (
    GenerationRequest,
    ServingEngine,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized-cache", action="store_true")
    ap.add_argument("--mla", action="store_true",
                    help="MLA model with a compressed latent cache")
    ap.add_argument("--max-new", type=int, default=16)
    args = ap.parse_args()

    if args.mla:
        from metal_flash_attention_plus_tpu.models.mla_transformer import (
            MLAConfig, init_mla_params,
        )
        from metal_flash_attention_plus_tpu.serving.engine import mla_executor

        cfg = MLAConfig(
            vocab_size=4096, d_model=256, num_layers=2, num_heads=8,
            head_dim=32, latent_dim=128, rope_dim=32, d_ff=512,
            max_seq=2048, dtype=jnp.bfloat16,
        )
        params = init_mla_params(cfg, jax.random.PRNGKey(0))
        print(f"MLA latent cache: {cfg.cache_width} values/token "
              f"(GQA equivalent would be {2 * cfg.num_heads * cfg.head_dim})")
        engine = ServingEngine(
            params, cfg, num_pages=128, page_tokens=64, max_batch=4,
            quantized_cache=args.quantized_cache, executor=mla_executor(),
        )
    else:
        cfg = TransformerConfig(
            vocab_size=4096, d_model=256, num_layers=2, num_heads=8,
            num_kv_heads=4, head_dim=32, d_ff=512, max_seq=2048,
            dtype=jnp.bfloat16,
        )
        params = init_params(cfg, jax.random.PRNGKey(0))
        engine = ServingEngine(
            params, cfg, num_pages=128, page_tokens=64, max_batch=4,
            quantized_cache=args.quantized_cache,
        )
    prompts = {
        1: list(range(10, 50)),
        2: [1, 2, 3],
        3: list(range(100, 400, 3)),
    }
    for rid, p in prompts.items():
        engine.submit(GenerationRequest(rid, p, max_new_tokens=args.max_new))
    out = engine.run()
    for rid, toks in sorted(out.items()):
        print(f"request {rid} ({len(prompts[rid])} prompt tokens) -> {toks}")


if __name__ == "__main__":
    main()
