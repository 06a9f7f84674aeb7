"""Causal-schedule cost attribution (production kernel, monkeypatched).

Causal fwd runs at ~0.61 of the FULL-mask per-FLOP rate at S=4K (report
.json) = ~1.42x per live subtile.  Decompose:

  full          : mask=FULL dense grid            — per-tile rate baseline
  causal        : production packed + dual-path   — the headline number
  causal-nomask : packed schedule, mask pass OFF  (wrong values, right
                  schedule) — isolates mask+dual-path VPU/branch cost
  causal-dense  : packed OFF -> dense grid + wavefront decision — isolates
                  the packed-pair win/overhead

Run SOLO on the TPU.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import importlib  # noqa: E402
fa = importlib.import_module(
    "metal_flash_attention_plus_tpu.ops.flash_attention")
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: E402
    CAUSAL, FULL,
)
from metal_flash_attention_plus_tpu.attention.tuning import (  # noqa: E402
    AttentionTuner,
)
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

B, H, S = 4, 8, 4096


def bench(name, mask, blocks, d, frac, patches=()):
    olds = []
    for mod, attr, new in patches:
        olds.append((mod, attr, getattr(mod, attr)))
        setattr(mod, attr, new)
    try:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, S, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, S, d), jnp.bfloat16)
        f = jax.jit(lambda q, k, v: fa.flash_attention_forward(
            q, k, v, mask=mask, block_sizes=blocks, interpret=False)[0])
        f(q, k, v)
        t = measure(f, q, k, v, iters=30, warmup=3)
        flops = 4 * B * H * S * S * d * frac
        # live 512-subtiles (frac of the dense count)
        nsub = B * H * (S // 512) ** 2 * frac
        print(f"{name:14s} d{d}  {flops / t / 1e12:7.1f} TF/s  "
              f"{t / nsub * 1e6:6.3f} us/512subtile")
        sys.stdout.flush()
    finally:
        for mod, attr, old in olds:
            setattr(mod, attr, old)


def nomask_mode(mask, has_mask, sq, skv):
    return "none", (0, 0, 0, 0)


def no_pack(lo, hi):
    q0, q1, n0, t, r, w = orig_pack(lo, hi)
    return q0, q1, n0, t, len(lo) * 4, int(max(hi - lo)) * 4  # fail 0.9 test


orig_pack = fa.build_packed_schedule
orig_rr = fa.compute_row_ranges


def uniform_ranges(width):
    def f(mask, sq, skv, **kw):
        import numpy as np
        rr = orig_rr(mask, sq, skv, **kw)
        out = np.zeros_like(rr)
        out[:, 1] = width
        return out
    return f


def main():
    for d in (128, 256):
        h = 8 if d == 128 else 4
        global B, H
        H = h
        bl_c = AttentionTuner.shared().recommend("fwd", d, S, causal=True)
        bl_f = AttentionTuner.shared().recommend("fwd", d, S, causal=False)
        print(f"-- d={d} causal blocks {bl_c} / full blocks {bl_f}")
        bench("full", FULL, bl_f, d, 1.0)
        bench("causal", CAUSAL, bl_c, d, 0.5)
        bench("causal-nomask", CAUSAL, bl_c, d, 0.5,
              patches=[(fa, "resolve_mask_mode", nomask_mode)])
        bench("causal-dense", CAUSAL, bl_c, d, 0.5,
              patches=[(fa, "build_packed_schedule", no_pack)])
        # windowed machinery at ZERO raggedness: full-width windows for
        # every row, mask pass off -> same work as `full` through the
        # causal plumbing.
        bench("windows-full", CAUSAL, bl_c, d, 1.0,
              patches=[(fa, "resolve_mask_mode", nomask_mode),
                       (fa, "compute_row_ranges", uniform_ranges(S))])
        # uniform HALF windows: half the work, zero raggedness -> isolates
        # short-row / small-grid effects from raggedness.
        bench("windows-half", CAUSAL, bl_c, d, 0.5,
              patches=[(fa, "resolve_mask_mode", nomask_mode),
                       (fa, "compute_row_ranges", uniform_ranges(S // 2))])


if __name__ == "__main__":
    main()
