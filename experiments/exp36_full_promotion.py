"""d=256 FULL-mask promotion study (round 4): with the lean schedule
landed for unmasked problems, re-run the exp29 arm matrix at FULL
through the PRODUCTION wrapper and pick the graded-arm config on BOTH
speed and the rel-L2 error gates (int8 <0.05, K4V8 <0.12).

Context: the reference's 86%/85%/86% ALU table is UNMASKED square
attention (SquareAttentionTest.testPerformance uses a default
descriptor, maskType .none) — FULL is the like-for-like phase.  exp28
proved fullint FULL reaches 214.8 TF/s bare; exp33 measured lean folded
FULL at 175.2 within-run.

Usage: exp36_full_promotion.py [h]
"""
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: E402
    CAUSAL, FULL,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes, flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402

S = 4096
D = 256


def cfg(bits, gran):
    return QuantConfig(
        bits=bits, granularity=getattr(QuantGranularity, gran),
        strategy=QuantStrategy.SYMMETRIC,
    )


def build(h, b, mask, bits_k, bits_v, gran_k, gran_v, qq, blocks,
          want_err=False):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, D), jnp.float32)
    if bits_k == 0:  # bf16 control — operands as ARGS (large closures
        # blow the remote-compile request size limit, HTTP 413)
        kb = k.astype(jnp.bfloat16)
        vb = v.astype(jnp.bfloat16)
        fj = jax.jit(lambda q, kb, vb: flash_attention_forward(
            q, kb, vb, mask=mask, block_sizes=blocks, interpret=False)[0])
        f = lambda q: fj(q, kb, vb)
    else:
        kq = quantize(k, cfg(bits_k, gran_k))
        vq = quantize(v, cfg(bits_v, gran_v))
        fj = jax.jit(lambda q, kq, vq: quantized_flash_attention_forward(
            q, kq, vq, mask=mask, block_sizes=blocks,
            quantize_q=qq, interpret=False)[0])
        f = lambda q: fj(q, kq, vq)
    f(q)
    rel = None
    if want_err:
        key = (mask.kind, b)
        if key not in _FP_CACHE:
            _FP_CACHE[key] = jax.jit(
                lambda q, k, v: flash_attention_forward(
                    q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                    mask=mask, interpret=False)[0]
            )
        o = f(q).astype(jnp.float32)
        o_fp = _FP_CACHE[key](q, k, v).astype(jnp.float32)
        rel = float(jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp))
    return f, (q,), rel


_FP_CACHE = {}


def slope(builder, b1=4, b2=16):
    f1, a1, rel = builder(b1, True)
    f2, a2, _ = builder(b2, False)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - b1), rel


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    b512 = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)
    b512m1 = BlockSizes(block_q=512, block_kv=512, block_kv_major=1024)
    b1024 = BlockSizes(block_q=1024, block_kv=512, block_kv_major=2048)

    arms = [
        ("bf16 FULL 512/512/M2048", FULL, 0, 0, "TENSOR", "CHANNEL",
         False, b512, 1.0),
        ("folded K8V8 FULL M2048", FULL, 8, 8, "TENSOR", "CHANNEL",
         False, b512, 1.0),
        ("fullint K8V8 FULL M2048", FULL, 8, 8, "ROW", "CHANNEL",
         True, b512, 1.0),
        ("fullint K8V8 FULL M1024", FULL, 8, 8, "ROW", "CHANNEL",
         True, b512m1, 1.0),
        ("folded K4V8 FULL M2048", FULL, 4, 8, "CHANNEL", "CHANNEL",
         False, b512, 1.0),
        ("fullint K4V8 FULL M2048", FULL, 4, 8, "ROW", "CHANNEL",
         True, b512, 1.0),
        ("folded K8V8 FULL bq1024", FULL, 8, 8, "TENSOR", "CHANNEL",
         False, b1024, 1.0),
        ("folded K8V8 CAUSAL ctl", CAUSAL, 8, 8, "TENSOR", "CHANNEL",
         False, b512, 0.5),
    ]
    for name, mask, bk, bv, gk, gv, qq, blocks, frac in arms:
        fl = 4 * h * S * S * D * frac
        try:
            sec, rel = slope(
                lambda b, we: build(
                    h, b, mask, bk, bv, gk, gv, qq, blocks, want_err=we)
            )
            rs = f" rel-err {rel:.4f}" if rel is not None else ""
            print(f"{name}: {fl/sec/1e12:6.1f} TF/s{rs}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)
            traceback.print_exc(limit=3)


if __name__ == "__main__":
    main()
