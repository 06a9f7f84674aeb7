"""exp40 (round 5): graded-arm configuration sweeps after exp38/exp39.

Sections (each within-run A/B; two-point batch slopes):
  bwd   — fwd+bwd d=256 FULL fullint: ROW-K (exp38 winner) vs TENSOR-K
          (the new k_tensor fold: −3 VPU multiplies/elem across the two
          backward kernels), plus dq/dkv block variants.
  fwd   — fwd d=256 FULL fullint: ROW-K vs TENSOR-K (ks_folded: the col
          multiply disappears).
  d128  — folded FULL block sweep ((512,512,M2048) exp39 141.7 vs the
          int8-table (1024,1024,M2048) vs (1024,512,M2048)); bf16 ctl at
          its own best.
  d64   — PACKED-API FULL block sweep (bq 512/1024/2048 × M1024/M2048).

Usage: exp40_round5_sweeps.py [bwd|fwd|d128|d64|all]
"""
import dataclasses
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.attention.masking import FULL  # noqa: E402
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes, flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    pack_heads,
    quantized_flash_attention,
    quantized_flash_attention_forward,
    quantized_flash_attention_forward_packed,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402
from metal_flash_attention_plus_tpu.utils.roofline import (  # noqa: E402
    attention_ginstrs,
)

S = 4096


def cfg(gran, bits=8):
    return QuantConfig(
        bits=bits, granularity=getattr(QuantGranularity, gran),
        strategy=QuantStrategy.SYMMETRIC,
    )


def build_fwd_bwd(h, b, gran_k, blocks):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    d = 256
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    do = jax.random.normal(ks[3], (b, h, S, d), jnp.bfloat16)
    kq = quantize(k, cfg(gran_k))
    vq = quantize(v, cfg("CHANNEL"))

    def loss(q, ks_, vs_, kq, vq, do):
        kq = dataclasses.replace(kq, scale=ks_)
        vq = dataclasses.replace(vq, scale=vs_)
        return jnp.sum(
            quantized_flash_attention(
                q, kq, vq, mask=FULL, block_sizes=blocks,
                quantize_q=True, bwd_fullint=True,
            ).astype(jnp.float32) * do.astype(jnp.float32)
        )

    fj = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    f = lambda q: fj(q, kq.scale, vq.scale, kq, vq, do)  # noqa: E731
    f(q)
    return f, (q,)


def build_fwd(d, h, b, kind, blocks, packed=False):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, d), jnp.float32)
    if kind == "bf16":
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        fj = jax.jit(lambda q, kb, vb: flash_attention_forward(
            q, kb, vb, mask=FULL, block_sizes=blocks, interpret=False)[0])
        f = lambda q: fj(q, kb, vb)  # noqa: E731
        args = (q,)
    elif packed:
        kq = quantize(k, cfg("CHANNEL"))
        vq = quantize(v, cfg("CHANNEL"))
        qp = pack_heads(q)
        fj = jax.jit(
            lambda qp, kq, vq: quantized_flash_attention_forward_packed(
                qp, kq, vq, mask=FULL, block_sizes=blocks,
                interpret=False)[0])
        f = lambda qp: fj(qp, kq, vq)  # noqa: E731
        args = (qp,)
    else:
        gran_k = {"fullint_row": "ROW", "fullint_tens": "TENSOR",
                  "folded": "TENSOR"}[kind]
        kq = quantize(k, cfg(gran_k))
        vq = quantize(v, cfg("CHANNEL"))
        qq = kind != "folded"
        fj = jax.jit(lambda q, kq, vq: quantized_flash_attention_forward(
            q, kq, vq, mask=FULL, block_sizes=blocks,
            quantize_q=qq, interpret=False)[0])
        f = lambda q: fj(q, kq, vq)  # noqa: E731
        args = (q,)
    f(*args)
    return f, args


def slope(builder, b1, b2, iters=10):
    f1, a1 = builder(b1)
    f2, a2 = builder(b2)
    t1 = min(measure(f1, *a1, iters=iters, warmup=2, trains=3)
             for _ in range(2))
    t2 = min(measure(f2, *a2, iters=iters, warmup=2, trains=3)
             for _ in range(2))
    return (t2 - t1) / (b2 - b1)


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    b512 = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)

    def bwd_blocks(qdq, kvdq, qdkv, kvdkv, mdq=2048, mdkv=2048):
        return BlockSizes(
            block_q=512, block_kv=512, block_kv_major=2048,
            block_q_dq=qdq, block_kv_dq=kvdq,
            block_q_dkv=qdkv, block_kv_dkv=kvdkv,
            block_kv_dq_major=mdq, block_q_dkv_major=mdkv,
        )

    if section in ("bwd", "all"):
        fl = 2.0 * attention_ginstrs(S, S, 256, num_heads=4, batch=1,
                                     phase="fwd_bwd")
        arms = [
            ("fwd+bwd fullint ROW-K (exp38 ctl)", "ROW",
             bwd_blocks(512, 512, 512, 512)),
            ("fwd+bwd fullint TENSOR-K", "TENSOR",
             bwd_blocks(512, 512, 512, 512)),
            ("fwd+bwd TENSOR-K dq(512,1024)", "TENSOR",
             bwd_blocks(512, 1024, 512, 512, mdq=2048)),
            ("fwd+bwd TENSOR-K dkv q-major 4096 cap", "TENSOR",
             bwd_blocks(512, 512, 1024, 512, mdkv=2048)),
        ]
        for name, gk, blk in arms:
            try:
                sec = slope(lambda b, gk=gk, blk=blk: build_fwd_bwd(
                    4, b, gk, blk), 4, 12, iters=8)
                print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__} {str(e)[:140]}")
                traceback.print_exc(limit=2)

    if section in ("fwd", "all"):
        fl = 4 * 4 * S * S * 256
        for name, kind in [
            ("fwd d256 fullint ROW-K", "fullint_row"),
            ("fwd d256 fullint TENSOR-K", "fullint_tens"),
        ]:
            try:
                sec = slope(lambda b, kind=kind: build_fwd(
                    256, 4, b, kind, b512), 4, 16)
                print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__} {str(e)[:140]}")

    if section in ("d128", "all"):
        fl = 4 * 8 * S * S * 128
        for name, kind, blk in [
            ("d128 bf16 (1024,1024,M2048)", "bf16",
             BlockSizes(block_q=1024, block_kv=1024, block_kv_major=2048)),
            ("d128 folded (512,512,M2048)", "folded", b512),
            ("d128 folded (1024,1024,M2048)", "folded",
             BlockSizes(block_q=1024, block_kv=1024, block_kv_major=2048)),
            ("d128 folded (1024,512,M2048)", "folded",
             BlockSizes(block_q=1024, block_kv=512, block_kv_major=2048)),
        ]:
            try:
                sec = slope(lambda b, kind=kind, blk=blk: build_fwd(
                    128, 8, b, kind, blk), 4, 16)
                print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__} {str(e)[:140]}")

    if section in ("d64", "all"):
        fl = 4 * 8 * S * S * 64
        for name, blk in [
            ("d64 packed bq512 M1024",
             BlockSizes(block_q=512, block_kv=512, block_kv_major=1024)),
            ("d64 packed bq1024 M1024",
             BlockSizes(block_q=1024, block_kv=512, block_kv_major=1024)),
            ("d64 packed bq1024 M2048",
             BlockSizes(block_q=1024, block_kv=512, block_kv_major=2048)),
            ("d64 packed bq2048 M1024",
             BlockSizes(block_q=2048, block_kv=512, block_kv_major=1024)),
        ]:
            try:
                sec = slope(lambda b, blk=blk: build_fwd(
                    64, 8, b, "packed", blk, packed=True), 4, 24)
                print(f"{name}: {fl/sec/1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__} {str(e)[:140]}")


if __name__ == "__main__":
    main()
