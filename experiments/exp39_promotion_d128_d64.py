"""exp39 (round 5): fullint promotion matrix at d=128 and d=64 + the
packed-layout d=64 public-API rate.

VERDICT r4 items 1-2: the fullint win existed only at d=256 (exp36);
report.json showed int8_full *slower* than bf16 at d=128 (0.87×), and
the d=64 graded arm paid the pack/unpack boundary.  This measures, at
FULL S=4K (the graded phase):

  d=128 (h=8): bf16 ctl / folded / fullint × {M2048, M1024, bq1024}
  d=64  (h=8): bf16 ctl / hpack natural-boundary (r4 graded arm) /
               PACKED-API (q pre-packed, o consumed packed — the round-5
               layout; zero boundary transposes) / fullint unpacked

Two-point batch slopes; rel-L2 vs the bf16 kernel on b=4.

Usage: exp39_promotion_d128_d64.py [section: d128|d64|all]
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
    pack_heads,
    quantized_flash_attention_forward,
    quantized_flash_attention_forward_packed,
    unpack_heads,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402

S = 4096
_FP = {}


def cfg(bits, gran):
    return QuantConfig(
        bits=bits, granularity=getattr(QuantGranularity, gran),
        strategy=QuantStrategy.SYMMETRIC,
    )


def build(d, h, b, kind, mask, blocks, want_err):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    if kind == "bf16":
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        fj = jax.jit(lambda q, kb, vb: flash_attention_forward(
            q, kb, vb, mask=mask, block_sizes=blocks, interpret=False)[0])
        f = lambda q: fj(q, kb, vb)  # noqa: E731
        args = (q,)
    elif kind == "packed":
        kq = quantize(k, cfg(8, "CHANNEL"))
        vq = quantize(v, cfg(8, "CHANNEL"))
        qp = pack_heads(q)
        fj = jax.jit(
            lambda qp, kq, vq: quantized_flash_attention_forward_packed(
                qp, kq, vq, mask=mask, block_sizes=blocks,
                interpret=False)[0])
        f = lambda qp: fj(qp, kq, vq)  # noqa: E731
        args = (qp,)
    else:
        if kind == "folded":
            kq = quantize(k, cfg(8, "TENSOR"))
            qq = False
        elif kind == "hpack":  # natural-boundary head-pair path
            kq = quantize(k, cfg(8, "CHANNEL"))
            qq = False
        else:  # fullint
            kq = quantize(k, cfg(8, "ROW"))
            qq = True
        vq = quantize(v, cfg(8, "CHANNEL"))
        fj = jax.jit(lambda q, kq, vq: quantized_flash_attention_forward(
            q, kq, vq, mask=mask, block_sizes=blocks,
            quantize_q=qq, interpret=False)[0])
        f = lambda q: fj(q, kq, vq)  # noqa: E731
        args = (q,)
    f(*args)
    rel = None
    if want_err:
        key = (d, mask.kind, b)
        if key not in _FP:
            _FP[key] = jax.jit(
                lambda q, k, v: flash_attention_forward(
                    q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                    mask=mask, interpret=False)[0])
        o = f(*args).astype(jnp.float32)
        if kind == "packed":
            o = unpack_heads(o)
        o_fp = _FP[key](q, k, v).astype(jnp.float32)
        rel = float(jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp))
    return f, args, rel


def run(d, h, kind, mask, blocks, b2=16, frac=1.0):
    b1 = 4
    f1, a1, rel = build(d, h, b1, kind, mask, blocks, True)
    f2, a2, _ = build(d, h, b2, kind, mask, blocks, False)
    t1 = min(measure(f1, *a1, iters=10, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=10, warmup=2, trains=3)
             for _ in range(2))
    sec = (t2 - t1) / (b2 - b1)
    fl = 4 * h * S * S * d * frac
    return fl / sec / 1e12, rel


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    b512 = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)
    b512m1 = BlockSizes(block_q=512, block_kv=512, block_kv_major=1024)
    b1024 = BlockSizes(block_q=1024, block_kv=512, block_kv_major=2048)

    arms = []
    if section in ("d128", "all"):
        arms += [
            ("d128 bf16 FULL M2048", 128, 8, "bf16", FULL, b512, 16, 1.0),
            ("d128 folded FULL M2048", 128, 8, "folded", FULL, b512, 16, 1.0),
            ("d128 fullint FULL M2048", 128, 8, "fullint", FULL, b512, 16, 1.0),
            ("d128 fullint FULL M1024", 128, 8, "fullint", FULL, b512m1, 16, 1.0),
            ("d128 fullint FULL bq1024", 128, 8, "fullint", FULL, b1024, 16, 1.0),
            ("d128 fullint CAUSAL ctl", 128, 8, "fullint", CAUSAL, b512, 16, 0.5),
        ]
    if section in ("d64", "all"):
        arms += [
            ("d64 bf16 FULL", 64, 8, "bf16", FULL, b512, 24, 1.0),
            ("d64 hpack natural (r4 arm)", 64, 8, "hpack", FULL, b512, 24, 1.0),
            ("d64 PACKED-API FULL", 64, 8, "packed", FULL, b512, 24, 1.0),
            ("d64 PACKED-API FULL bq1024", 64, 8, "packed", FULL, b1024, 24, 1.0),
            ("d64 fullint unpacked FULL", 64, 8, "fullint", FULL, b512, 24, 1.0),
            ("d64 PACKED-API CAUSAL", 64, 8, "packed", CAUSAL, b1024, 24, 0.5),
        ]
    for name, d, h, kind, mask, blocks, b2, frac in arms:
        try:
            tf, rel = run(d, h, kind, mask, blocks, b2, frac)
            rs = f" rel {rel:.4f}" if rel is not None else ""
            print(f"{name}: {tf:6.1f} TF/s{rs}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:140]}",
                  flush=True)
            traceback.print_exc(limit=2)


if __name__ == "__main__":
    main()
