"""Minimal repro for the Mosaic HTTP-500 compiler crash on 8×-unrolled
quantized bodies (docs/perf_notes.md round-2 "two-level"; COVERAGE.md
known-gaps).

The production guard (`ops/quantized_attention.py`, n_inner >= 8 check)
exists because this geometry kills the compile RPC — run with
the guard commented out to reproduce the raw failure (expect a JaxRuntimeError /
INTERNAL from tpu_compile_helper, NOT a Python-level error), or without
it to see the guard's actionable ValueError.

Geometry: quantized fwd d=128, S=4096, blocks (512, 512, major 4096)
→ n_inner = 8 unrolled dequant bodies per grid step.

Also documented here (exp27): `dot_general(int8, int8,
preferred_element_type=float32)` crashes the same way — quantized kernels
must accumulate int8×int8 into INT32 and convert after.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL  # noqa: E402
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


def main():
    b, h, s, d = 1, 1, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.SYMMETRIC,
    )
    kq = quantize(jax.random.normal(ks[1], (b, h, s, d), jnp.float32), cfg)
    vq = quantize(jax.random.normal(ks[2], (b, h, s, d), jnp.float32), cfg)
    blocks = BlockSizes(block_q=512, block_kv=512, block_kv_major=4096)
    try:
        out = quantized_flash_attention_forward(
            q, kq, vq, mask=CAUSAL, block_sizes=blocks, interpret=False
        )
        print("compiled?!", out[0].shape)
    except ValueError as e:
        print(f"guard fired as designed: {e}")


if __name__ == "__main__":
    main()
