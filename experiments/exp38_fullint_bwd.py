"""exp38 (round 5): FULL-INTEGER backward A/B at d=256 FULL.

VERDICT r4 item 3: the forward gained +30% from int8×int8 MXU dots
(exp36: 211 TF/s); the backward still ran dequant/folded bf16 dots and
quantized fwd+bwd (162.4 graded) trailed its own potential.  This arm
matrix measures the full custom-vjp pipeline (honest dQ + dKV grads wrt
q AND the K/V scales — scale cotangents keep the dKV kernel un-DCE'd):

  - bf16 control
  - folded int8 (r4 graded arm: K TENSOR + V CHANNEL, exact backward)
  - fullint fwd + exact ROW-folded backward   (isolate the fwd gain)
  - fullint fwd + fullint bwd level 1         (recompute dots int8)
  - fullint fwd + fullint bwd level 2         (all five dots int8)

Op model: (9D+15)·N²·2 FLOPs (reference README.md:128-135); two-point
batch slopes cancel the tunnel's per-dispatch cost.

Usage: exp38_fullint_bwd.py [h] [b2]
"""
import dataclasses
import os
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402
from metal_flash_attention_plus_tpu.attention.masking import FULL  # noqa: E402
from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: E402
    BlockSizes, flash_attention,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_flash_attention,
)
from metal_flash_attention_plus_tpu.quant.params import (  # noqa: E402
    QuantConfig, QuantGranularity, QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize  # noqa: E402
from metal_flash_attention_plus_tpu.utils.roofline import (  # noqa: E402
    attention_ginstrs,
)

S = 4096
D = 256
BLOCKS = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)


def cfg(gran):
    return QuantConfig(
        bits=8, granularity=getattr(QuantGranularity, gran),
        strategy=QuantStrategy.SYMMETRIC,
    )


def build(h, b, kind, level=None):
    if level is not None:
        os.environ["MFA_BWD_FULLINT_LEVEL"] = level
    else:
        os.environ.pop("MFA_BWD_FULLINT_LEVEL", None)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, S, D), jnp.float32)
    do = jax.random.normal(ks[3], (b, h, S, D), jnp.bfloat16)

    if kind == "bf16":
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)

        def loss(q, kb, vb, do):
            return jnp.sum(
                flash_attention(
                    q, kb, vb, mask=FULL, block_sizes=BLOCKS
                ).astype(jnp.float32) * do.astype(jnp.float32)
            )

        fj = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        f = lambda q: fj(q, kb, vb, do)  # noqa: E731
        f(q)
        return f, q

    gran_k = "TENSOR" if kind == "folded" else "ROW"
    kq = quantize(k, cfg(gran_k))
    vq = quantize(v, cfg("CHANNEL"))
    qq = kind != "folded"
    fi = kind in ("fullint_l1", "fullint_l2")

    def loss(q, ks_, vs_, kq, vq, do):
        kq = dataclasses.replace(kq, scale=ks_)
        vq = dataclasses.replace(vq, scale=vs_)
        return jnp.sum(
            quantized_flash_attention(
                q, kq, vq, mask=FULL, block_sizes=BLOCKS,
                quantize_q=qq, bwd_fullint=fi,
            ).astype(jnp.float32) * do.astype(jnp.float32)
        )

    fj = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    f = lambda q: fj(q, kq.scale, vq.scale, kq, vq, do)  # noqa: E731
    f(q)
    return f, q


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    b2 = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    b1 = 4
    fl = 2.0 * attention_ginstrs(S, S, D, num_heads=h, batch=1,
                                 phase="fwd_bwd")

    arms = [
        ("bf16 fwd+bwd ctl", "bf16", None),
        ("folded int8 (r4 graded)", "folded", None),
        ("fullint fwd + exact bwd", "fullint_fwd_only", None),
        ("fullint fwd+bwd L1 (recompute dots int8)", "fullint_l1", "1"),
        ("fullint fwd+bwd L2 (all five dots int8)", "fullint_l2", "2"),
    ]
    ref_dq = {}
    for name, kind, level in arms:
        try:
            f1, q1 = build(h, b1, kind, level)
            # grad-error probe at b1 (dq rel-L2 vs the bf16 control)
            g = f1(q1)[0].astype(jnp.float32)
            if kind == "bf16":
                ref_dq["dq"] = g
            rel = (
                float(jnp.linalg.norm(g - ref_dq["dq"])
                      / jnp.linalg.norm(ref_dq["dq"]))
                if "dq" in ref_dq else float("nan")
            )
            f2, q2 = build(h, b2, kind, level)
            t1 = min(measure(f1, q1, iters=8, warmup=2, trains=3)
                     for _ in range(2))
            t2 = min(measure(f2, q2, iters=8, warmup=2, trains=3)
                     for _ in range(2))
            sec = (t2 - t1) / (b2 - b1)
            print(f"{name}: {fl/sec/1e12:6.1f} TF/s  dq-rel {rel:.4f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)
            traceback.print_exc(limit=3)


if __name__ == "__main__":
    main()
