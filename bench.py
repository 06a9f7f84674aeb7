"""Headline benchmark — prints ONE JSON line for the driver.

BASELINE.json metric: "Attn TFLOPs/chip + GB/s at INT8/INT4 (seq 4K,
d=64/256); max abs err vs FP32".  All arms seq 4096, timed by two-point
batch slopes and scored with the reference's op-count model
(``README.md:197-213``: (2D+5)·N²·2 fwd / (9D+15)·N²·2 fwd+bwd FLOPs,
halved for causal).

GRADED arms run FULL (unmasked) attention — the reference's 86/85/86%
utilization table comes from ``SquareAttentionTest.testPerformance``
with a DEFAULT descriptor (maskType .none, i.e. unmasked square
attention), so FULL is the like-for-like phase; causal rates are
reported as detail rows (rounds 1-3 graded causal against the unmasked
reference fractions, understating parity by the ~1.45× causal
short-row structure tax — docs/perf_notes.md round 4).

Round 5 grades ALL THREE of the reference's head dims plus the
fwd+bwd north star, each at its measured-best quantized pipeline
(exp39/exp40 promotion matrices):

- fwd d=64 INT8-KV through the PACKED-LAYOUT public API (head pairs
  lane-packed across layers — zero boundary transposes; the layout the
  transformer/serving paths produce for free).
- fwd d=128 INT8-KV FOLDED (mixed bf16×int8 dots): at d=128 the kernel
  is VPU-bound, so the full-integer pipeline's extra scale/round ops
  LOSE to folded (exp39: 131.7 vs 141.7 TF/s) — folded is the honest
  fastest int8 config there.
- fwd d=256 INT8 FULL-INTEGER (both MXU dots int8×int8, exp36).
- fwd+bwd d=256 FULL-INTEGER forward AND backward (all recompute GEMMs
  int8×int8; exp38/exp40: 179.7-198.0 TF/s = 1.16× the bf16 fwd+bwd
  control, dq rel-L2 0.017) — the reference's own "quantized backward
  1.14-1.48× faster" headline (README.md:389-393).
- value = mean TFLOP/s of the three fwd arms.
- vs_baseline: mean over the four graded arms of (our fraction of FULL
  chip peak ÷ the reference's own ALU fraction for that phase: 83%
  sustained fwd ``README.md:104``, 63% fwd+bwd ``README.md:256-259``).
  The old min(1, d/128) MXU cap is removed — the head-packed d=64
  kernel fills the contraction, so utilization is vs full peak like the
  reference's.

TIME-BOXING (round-4 rework; round 3 shipped rc=124/no JSON): every arm
runs under a global ``MFA_BENCH_BUDGET_S`` budget (default 540 s).  Arms
run in priority order — round 5 puts all FOUR graded arms first and
emits the headline right after them (a congestion spell can eat 300+ s
of compiles per arm, and the r4 ordering starved the graded d=256 and
fwd+bwd arms once).  The old place-fwd+bwd-last rule is retired:
exp38/exp40 built grad executables across five sequential arms without
the r3-era allocation poisoning; the detail arms that now follow it
carry transient-retry logic regardless.  SIGTERM and SIGALRM backstops
still emit the headline from whatever completed, so a stalled arm can
never starve the round of its number.

Detail lines (stderr) additionally cover the BANDWIDTH-BOUND regime the
int KV cache exists for (batch-1, Skv=32K decode-shape: int8/int4 speedup
over bf16 — the reference's 2.5×/3.0× claim, ``README.md:291-296``) and
error vs the fp32 kernel.  Errors are reported as BOTH max-abs (on ~N(0,1)
outputs) and relative L2, gated just above the measured iid-gaussian
noise floors (REL_GATES; docs/perf_notes.md "int4 error anatomy" —
synthetic iid data is int4's WORST case).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.attention.tuning import AttentionTuner
from metal_flash_attention_plus_tpu.ops.flash_attention import (
    flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize
from metal_flash_attention_plus_tpu.utils.profiling import measure
from metal_flash_attention_plus_tpu.utils.roofline import (
    attention_flops,
    detect_chip,
)

REFERENCE_ALU_FRACTION = 0.83  # README.md:104 — 4400/5308 GINSTR/s, M1 Max
REFERENCE_FWD_BWD_FRACTION = 0.63  # README.md:256-259 — fwd+bwd 62-64%, M1
SEQ = 4096
# Relative-L2 error floors for iid-gaussian inputs (docs/perf_notes.md
# "int4 error anatomy"; tests/test_quantized_attention.py gates).
# int8 fold is near-exact (measured rel 0.015); int4-K on iid gaussian
# has an information-theoretic floor at d=256 (absmax 4-bit => >=0.09*sigma
# per element; COVERAGE.md known-gaps: ~0.13-0.16 rel regardless of
# granularity, and V-side error passes the softmax average UNDAMPED) -
# K4V8 measured 0.141, K4V4 0.212 on this data.  Gates sit just above
# the documented floors; real (structured) KV sits well below.
REL_GATES = {"int8": 0.05, "k4v8": 0.16, "int4": 0.25}

# Measurement knobs, reduced once at startup when the tunnel is CONGESTED
# (a trivial dispatch costing >50 ms means every measured train is
# round-trip-bound: 120 dispatches/arm at 0.5 s each would eat the whole
# budget — fewer, noisier samples beat missing arms; the slope still
# cancels the intercept exactly).  Set by _calibrate_measurement().
MEAS = {"iters": 10, "trains": 3, "reps": 2, "congested": False}


def _calibrate_measurement():
    # Keep the probe itself tiny — under hard congestion EVERY dispatch
    # costs ~0.5-30 s, so this is 4 round-trips, not a timing study.
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda x: x + 1.0)
    f(x)
    t = measure(f, x, iters=2, warmup=1, trains=1)
    if t > 0.05:
        MEAS.update(iters=5, trains=2, reps=1, congested=True)
        print(f"congested tunnel (dispatch {t*1e3:.0f} ms) — reduced "
              "measurement reps", file=sys.stderr, flush=True)


def _slope_min(f, *args, iters=None):
    it = iters or MEAS["iters"]
    return min(
        measure(f, *args, iters=it, warmup=2, trains=MEAS["trains"])
        for _ in range(MEAS["reps"])
    )


BUDGET_S = float(os.environ.get("MFA_BENCH_BUDGET_S", "540"))
_T0 = time.monotonic()


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


class _Deadline(Exception):
    pass


_results: dict = {}
_skipped: list = []
_headline_emitted = False


def _arm(name: str, est_s: float, fn):
    """Run one benchmark arm under the global budget.

    Skips (and flags) the arm when the remaining budget is below its cost
    estimate; converts arm exceptions into skip records so one bad arm
    (VMEM OOM, Mosaic crash) cannot kill the whole benchmark."""
    left = remaining()
    if left < est_s:
        _skipped.append(f"{name}(budget:{left:.0f}s<{est_s:.0f}s)")
        print(f"skip: {name} — budget", file=sys.stderr, flush=True)
        return None
    t_arm = time.monotonic()
    r = None
    for attempt in (0, 1):
        try:
            r = fn()
            break
        except _Deadline:
            raise
        except Exception as e:  # noqa: BLE001 — isolate arm failures
            # RESOURCE_EXHAUSTED here tracks tunnel CONGESTION, not HBM
            # (a fresh probe allocates 12+ GB while arms fail) — back
            # off once and retry before giving up on the arm.
            transient = "RESOURCE_EXHAUSTED" in str(e)
            if attempt == 0 and transient and remaining() > est_s + 45:
                print(
                    f"retry: {name} after transient {type(e).__name__}",
                    file=sys.stderr, flush=True,
                )
                time.sleep(30)
                continue
            _skipped.append(f"{name}({type(e).__name__})")
            print(
                f"skip: {name} — {type(e).__name__}: {str(e)[:120]}",
                file=sys.stderr, flush=True,
            )
            return None
    _results[name] = r
    import gc

    gc.collect()  # drop the arm's device buffers before the next build
    try:
        live = sum(x.nbytes for x in jax.live_arrays()) / 1e9
    except Exception:  # noqa: BLE001
        live = -1.0
    print(
        f"detail: {name}: {r} [{time.monotonic() - t_arm:.0f}s, "
        f"live {live:.2f} GB]",
        file=sys.stderr, flush=True,
    )
    return r


def kv_config(bits: int, operand: str = "k") -> QuantConfig:
    # Every arm runs the FOLDED dequant-free pipeline (the fastest config
    # at each width, docs/perf_notes.md): symmetric CHANNEL scales fold
    # into the Q pre-scale (K, exact elementwise) / the store vector (V);
    # int4 payloads nibble-unpack in-kernel.  Both MXU dots take the int
    # payloads directly (mixed bf16×int8) — zero per-tile dequant work.
    # K TENSOR at int8 (folds to a scalar; same speed, matches the
    # measured 0.025 err); CHANNEL at int4 (per-d adaptivity is what the
    # reference's ConvRot/BLOCK_2D machinery exists for).
    gran = (
        QuantGranularity.CHANNEL
        if (bits == 4 or operand == "v")
        else QuantGranularity.TENSOR
    )
    return QuantConfig(
        bits=bits, granularity=gran, strategy=QuantStrategy.SYMMETRIC,
    )


_fp_cache: dict = {}


def _fp_ref(q, k, v, causal=True):
    """fp32-input flash forward at q's shape — compiled once per shape."""
    key = (tuple(q.shape), causal)
    mask = CAUSAL if causal else FULL
    if key not in _fp_cache:
        _fp_cache[key] = jax.jit(
            lambda q, k, v: flash_attention_forward(
                q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                mask=mask, interpret=False,
            )[0]
        )
    return _fp_cache[key](q, k, v)


def _build_arm(
    d: int, h: int, bits: int, b: int, bits_v: int = None, causal=True,
    pipeline: str = "folded",
):
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        BlockSizes,
    )

    fullint = pipeline == "fullint"
    if fullint:
        # FULL-INTEGER pipeline (exp36 winner at FULL d=256: 211.2 TF/s,
        # rel 0.033 < the 0.05 gate — BOTH MXU dots int8×int8 at 2× the
        # bf16 rate): per-token symmetric K (zero-point-free scores) +
        # CHANNEL V (scales fold out of the PV dot), quantize_q=True.
        kcfg = QuantConfig(
            bits=bits, granularity=QuantGranularity.ROW,
            strategy=QuantStrategy.SYMMETRIC,
        )
    elif pipeline == "packed":
        # PACKED-LAYOUT d=64 public API (round 5, exp40): head pairs
        # lane-packed across layers; CHANNEL K/V (the folded-scale
        # contract).  Packing happens ONCE at build — the layout a
        # packed-mode model carries between layers for free
        # (models/transformer._split_heads_packed).
        kcfg = QuantConfig(
            bits=bits, granularity=QuantGranularity.CHANNEL,
            strategy=QuantStrategy.SYMMETRIC,
        )
    else:
        kcfg = kv_config(bits, "k")
    if pipeline == "packed":
        vcfg = QuantConfig(
            bits=8 if bits_v is None else bits_v,
            granularity=QuantGranularity.CHANNEL,
            strategy=QuantStrategy.SYMMETRIC,
        )
    else:
        vcfg = kv_config(bits if bits_v is None else bits_v, "v")

    # ONE jitted build: eager random+quantize ops are ~25 dispatches per
    # build and each dispatch costs 0.5+ s in congestion spells.
    def _gen(key):
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, h, SEQ, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, SEQ, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, h, SEQ, d), jnp.float32)
        return q, k, v, quantize(k, kcfg), quantize(v, vcfg)

    q, k, v, kq, vq = jax.jit(_gen)(jax.random.PRNGKey(0))

    # Blocks: measured optima per pipeline (exp36/exp39/exp40 promotion
    # matrices, docs/perf_notes.md round 5); int4 keeps the quantized
    # tuner table.
    if fullint:
        blocks = BlockSizes(block_q=512, block_kv=512, block_kv_major=2048)
    elif pipeline == "packed":
        blocks = BlockSizes(block_q=1024, block_kv=512, block_kv_major=1024)
    elif pipeline == "folded" and d == 128 and not causal:
        blocks = BlockSizes(block_q=1024, block_kv=512, block_kv_major=2048)
    elif bits == 8:
        blocks = AttentionTuner.shared().recommend(
            "fwd", d, SEQ, causal=causal
        )
    else:
        blocks = AttentionTuner.shared().recommend(
            "fwd_q", d, SEQ, bits=bits
        )
    mask = CAUSAL if causal else FULL
    # Operands as jit ARGS, not closures — large captured arrays inflate
    # the remote-compile request (HTTP 413 at ~200 MB, exp36).
    if pipeline == "packed":
        from metal_flash_attention_plus_tpu.ops.quantized_attention import (
            pack_heads,
            quantized_flash_attention_forward_packed,
            unpack_heads,
        )

        qp = pack_heads(q)
        fj = jax.jit(
            lambda qp, kq, vq: quantized_flash_attention_forward_packed(
                qp, kq, vq, mask=mask, block_sizes=blocks, interpret=False,
            )[0]
        )

        def f(qp):
            return fj(qp, kq, vq)

        f(qp)
        # The error probe unpacks the packed O outside the timed fn.
        return f, qp, k, v, kq, vq, unpack_heads
    fj = jax.jit(
        lambda q, kq, vq: quantized_flash_attention_forward(
            q, kq, vq, mask=mask, block_sizes=blocks,
            quantize_q=fullint, interpret=False,
        )[0]
    )

    def f(q):
        return fj(q, kq, vq)

    f(q)
    return f, q, k, v, kq, vq, None


def run_config(
    d: int, h: int, bits: int, chip, bits_v: int = None, gate_key: str = "",
    causal: bool = True, pipeline: str = "folded", b2: int = 24,
) -> dict:
    # Two-point batch-slope timing: this tunnel stack adds a FLUCTUATING
    # 0.45-2.7 ms unpipelined cost per dispatch (a trivial ``x+1`` jit
    # call measures 446-824 µs depending on the hour; flash calls fit
    # t = intercept + slope·work).  The slope between two batch sizes
    # cancels the intercept exactly and reports the kernel's steady-state
    # device rate — the same quantity the reference times by duplicating
    # dispatches inside ONE command buffer and reading
    # gpuEndTime - gpuStartTime (QuantizedAttention.swift:878-989).
    b1 = 4
    f1, q1, k, v, kq, vq, unpack = _build_arm(
        d, h, bits, b1, bits_v, causal, pipeline
    )
    f2, q2, *_ = _build_arm(d, h, bits, b2, bits_v, causal, pipeline)

    o = f1(q1)
    if unpack is not None:  # packed layout: probe errors in natural layout
        o = unpack(o)
        q_nat = unpack(q1).astype(jnp.bfloat16)
    else:
        q_nat = q1
    o_fp = _fp_ref(q_nat, k, v, causal)
    diff = o.astype(jnp.float32) - o_fp.astype(jnp.float32)
    max_err = float(jnp.max(jnp.abs(diff)))
    rel_err = float(
        jnp.linalg.norm(diff) / jnp.linalg.norm(o_fp.astype(jnp.float32))
    )

    t1 = _slope_min(f1, q1)
    t2 = _slope_min(f2, q2)
    flops_per_b = attention_flops(SEQ, SEQ, d, num_heads=h, batch=1) / (
        2 if causal else 1
    )
    sec_per_b = max((t2 - t1) / (b2 - b1), 1e-9)
    tflops = flops_per_b / sec_per_b / 1e12
    payload = (kq.data.nbytes + vq.data.nbytes) / b1
    gbs = (q1.nbytes / b1 + payload + o.nbytes / b1) / sec_per_b / 1e9
    # Utilization vs the FULL chip peak — the reference's own protocol
    # (its 86/85/86% table divides by total ALU GINSTR/s).  The previous
    # min(1, d/128) MXU-geometry cap is gone: the head-pair-packed d=64
    # kernel fills the 128-deep contraction (ops/quantized_attention
    # _hpack_kernel), so a capped denominator would overstate util.
    util = tflops / chip.bf16_tflops
    gate = REL_GATES.get(gate_key)
    return dict(
        d=d, bits=bits if bits_v is None else f"k{bits}v{bits_v}",
        mask="causal" if causal else "full",
        pipeline=pipeline,
        tflops=round(tflops, 2), gbs=round(gbs, 1),
        max_err=round(max_err, 4), rel_err=round(rel_err, 4),
        rel_gate=gate, rel_ok=(rel_err < gate) if gate else None,
        util=round(util, 4),
    )


def run_fwd_bwd_config(d: int, h: int, chip, causal: bool = False) -> dict:
    """Quantized fwd+bwd — the north-star metric (BASELINE.json: "quantized
    flash-attention fwd+bwd at ≥85% of roofline").  Round 5: the FULL-
    INTEGER pipeline end to end — fullint forward (both MXU dots
    int8×int8) AND the fullint backward (all recompute GEMMs int8×int8,
    per-token-quantized Q/dO; exp38/exp40 verdict — level 1, output dots
    mixed bf16×int8; dq rel-L2 0.017 vs the exact backward), with
    scale/zp cotangents.  Op model: (9D+15)·N²·2 FLOPs
    (``README.md:128-135``); FULL mask by default — the reference's
    fwd+bwd table is unmasked square attention too.  Reference bar: its
    quantized backward is 1.14-1.48× FASTER than the FP16 backward
    (``README.md:389-393``); exp38/exp40 measured this pipeline at
    1.16-1.27× the bf16 fwd+bwd control."""
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        BlockSizes,
    )
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention,
    )
    from metal_flash_attention_plus_tpu.utils.roofline import (
        attention_ginstrs,
    )

    # exp40 block sweep: dkv q-block 1024 (major 2048) +4% over 512.
    # exp44: dq q-block 1024 +1.6% (194.9 vs 191.8 within-run); fwd
    # bq1024 under fullint VMEM-OOMs (16.36M > 16M) — bq512 stands.
    blocks = BlockSizes(
        block_q=512, block_kv=512, block_kv_major=2048,
        block_q_dq=1024, block_kv_dq=512, block_kv_dq_major=2048,
        block_q_dkv=1024, block_kv_dkv=512, block_q_dkv_major=2048,
    )
    mask = CAUSAL if causal else FULL

    def build(b):
        def _gen(key):
            ks = jax.random.split(key, 4)
            q = jax.random.normal(ks[0], (b, h, SEQ, d), jnp.bfloat16)
            k = jax.random.normal(ks[1], (b, h, SEQ, d), jnp.float32)
            v = jax.random.normal(ks[2], (b, h, SEQ, d), jnp.float32)
            do = jax.random.normal(ks[3], (b, h, SEQ, d), jnp.bfloat16)
            kq = quantize(k, QuantConfig(
                bits=8, granularity=QuantGranularity.ROW,
                strategy=QuantStrategy.SYMMETRIC,
            ))
            vq = quantize(v, QuantConfig(
                bits=8, granularity=QuantGranularity.CHANNEL,
                strategy=QuantStrategy.SYMMETRIC,
            ))
            return q, do, kq, vq

        # One jitted build (eager dispatch costs dominate in congestion).
        q, do, kq, vq = jax.jit(_gen)(jax.random.PRNGKey(0))
        import dataclasses as _dc

        def loss(q, ks_, vs_, kq, vq, do):
            # Differentiate wrt q AND the K/V scales: scale cotangents
            # flow through the dKV kernel, so XLA cannot dead-code it.
            # (grad-wrt-q-only let the dKV pallas call be DCE'd — the
            # r2/r3 "fwd+bwd" numbers actually measured fwd+dQ under a
            # fwd+bwd FLOP model; docs/perf_notes.md round 4.)
            kq = _dc.replace(kq, scale=ks_)
            vq = _dc.replace(vq, scale=vs_)
            return jnp.sum(
                quantized_flash_attention(
                    q, kq, vq, mask=mask, block_sizes=blocks,
                    quantize_q=True, bwd_fullint=True,
                ).astype(jnp.float32)
                * do.astype(jnp.float32)
            )

        fj = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        def f(q):
            return fj(q, kq.scale, vq.scale, kq, vq, do)

        f(q)
        return f, q

    b1, b2 = 4, 12
    f1, q1 = build(b1)
    f2, q2 = build(b2)
    t1 = _slope_min(f1, q1, iters=8)
    t2 = _slope_min(f2, q2, iters=8)
    sec_per_b = max((t2 - t1) / (b2 - b1), 1e-9)
    flops_per_b = (
        2.0 * attention_ginstrs(
            SEQ, SEQ, d, num_heads=h, batch=1, phase="fwd_bwd"
        ) / (2 if causal else 1)
    )
    tflops = flops_per_b / sec_per_b / 1e12
    util = tflops / chip.bf16_tflops  # vs FULL peak (see run_config)
    return dict(
        phase="fwd_bwd", d=d, bits=8, pipeline="fullint",
        mask="causal" if causal else "full",
        tflops=round(tflops, 2), util=round(util, 4),
    )


def run_bandwidth_arm() -> dict:
    """Long-context paged-DECODE regime (the serving shape the int KV
    cache exists for): 32K-context sequences through the multi-page
    DMA-wave decode kernel.  Two-point batch slope (4 vs 16 sequences)
    cancels the tunnel's per-dispatch cost; reports the marginal KV read
    rate and the int8-cache speedup."""
    import numpy as np

    from metal_flash_attention_plus_tpu.serving.paged_attention import (
        paged_decode_attention,
    )

    # page_tokens=256: the wave kernel issues one async copy per page
    # (~0.25 us issue cost regardless of bytes) — 128-token pages are
    # ISSUE-bound and cap the int8 win below the byte ratio; 256+ is
    # bandwidth-bound (exp26 sweep, docs/perf_notes.md).
    hq, hkv, d, pt, skv = 8, 8, 128, 256, 32768
    pps = skv // pt

    def build(b, bits):
        np_ = b * pps + 1
        ks = jax.random.split(jax.random.PRNGKey(1), 2)
        q = jax.random.normal(ks[0], (b, hq, d), jnp.bfloat16)
        kvp = jax.random.normal(ks[1], (hkv, np_, 2 * pt, d), jnp.bfloat16)
        rng = np.random.default_rng(0)
        # DISJOINT page sets per sequence — shared pages let HBM reads
        # cache-hit and overstate both GB/s and the bf16 baseline.
        perm = rng.permutation(np_ - 1)
        pts_ = jnp.asarray(
            np.stack(
                [perm[i * pps:(i + 1) * pps] for i in range(b)]
            ).astype(np.int32)
        )
        lengths = jnp.full((b,), skv, jnp.int32)
        if bits == 8:
            kvq = jnp.clip(
                jnp.round(kvp.astype(jnp.float32) * 10.0), -127, 127
            ).astype(jnp.int8)
            sc = jnp.full((hkv, np_, 1, pt), 0.1, jnp.float32)
            f = jax.jit(
                lambda q, kvq, sc: paged_decode_attention(
                    q, kvq, pts_, lengths, page_tokens=pt,
                    k_scales=sc, v_scales=sc
                )
            )
            args = (q, kvq, sc)
        elif bits == 4:
            # Shared-byte int4 pool (K low / V high nibble — a QUARTER
            # of bf16's page bytes; serving.kv_cache layout).
            from metal_flash_attention_plus_tpu.serving.kv_cache import (
                _pack_tokens_kv4,
            )

            # jit the pack on bf16 slices: the eager f32 path
            # materializes ~5x the pool in int32/f32 temps and OOMs at
            # b2=16; under jit the conversions fuse.
            byte, ksc, vsc = jax.jit(_pack_tokens_kv4)(
                kvp[:, :, :pt], kvp[:, :, pt:]
            )
            ksc = ksc[..., 0][:, :, None, :]
            vsc = vsc[..., 0][:, :, None, :]
            f = jax.jit(
                lambda q, byte, ksc, vsc: paged_decode_attention(
                    q, byte, pts_, lengths, page_tokens=pt,
                    k_scales=ksc, v_scales=vsc, kv_bits=4
                )
            )
            args = (q, byte, ksc, vsc)
        else:
            f = jax.jit(
                lambda q, kvp: paged_decode_attention(
                    q, kvp, pts_, lengths, page_tokens=pt
                )
            )
            args = (q, kvp)
        f(*args)
        return f, args

    b1, b2 = 4, 16

    # INTERLEAVED A/B: the tunnel's steady-state rate drifts within a
    # session (r2 published 2.66×, a same-code rerun 1.67×).  Measuring
    # bf16 fully then int8 fully lets a rate shift between the arms move
    # the RATIO; cycling (bf16-b1, int8-b1, int4-b1, ...-b2) × R rounds
    # pins the arms to the same rate regime, and slopes are computed
    # PER ROUND from same-round (t1, t2) pairs (a cross-round min pair
    # can span drift regimes and invert).
    keys = ("bf16", "int8", "int4")
    arms = {}
    for key, bits_ in (("bf16", 16), ("int8", 8), ("int4", 4)):
        arms[key] = (build(b1, bits_), build(b2, bits_))
    rounds = {k: [] for k in keys}
    n_rounds = 4 if remaining() > 60 else 2
    for _ in range(n_rounds):
        for key in keys:
            pair = []
            for bi in (0, 1):
                f, a = arms[key][bi]
                pair.append(measure(f, *a, iters=10, warmup=1, trains=2))
            rounds[key].append(pair)

    def slope_of(key):
        # Per-round slopes; MEDIAN over rounds with t2 > t1 (min picks
        # the most noise-deflated round and produced >HBM-roofline
        # readings; median is stable).  Inverted rounds (t2 <= t1: a
        # drift-regime flip mid-round) are dropped and flagged rather
        # than silently clamped (ADVICE r3).
        slopes = sorted(
            (t2 - t1) / (b2 - b1) for t1, t2 in rounds[key] if t2 > t1
        )
        inverted = len(slopes) < len(rounds[key])
        if not slopes:
            return None, min(t1 for t1, _ in rounds[key]), True
        mid = slopes[len(slopes) // 2]
        return mid, min(t1 for t1, _ in rounds[key]), inverted

    per_seq_bf16, t1_bf16, inv_b = slope_of("bf16")
    per_seq_int8, _, inv_i = slope_of("int8")
    per_seq_int4, _, inv_4 = slope_of("int4")
    kv_bytes_seq = 2 * skv * hkv * d * 2
    out = dict(inverted_rounds=bool(inv_b or inv_i or inv_4))
    if per_seq_bf16 is None or per_seq_int8 is None:
        out["decode_slope"] = "all rounds inverted — no slope"
        return out
    out.update(
        decode_bf16_ms=round(per_seq_bf16 * b1 * 1e3, 3),
        decode_gbs=round(kv_bytes_seq / per_seq_bf16 / 1e9, 1),
        int8_speedup=round(per_seq_bf16 / per_seq_int8, 2),
        int8_capacity=2.0,  # context per HBM byte vs bf16
    )
    if per_seq_int4 is not None:
        out["int4_speedup"] = round(per_seq_bf16 / per_seq_int4, 2)
        out["int4_capacity"] = 4.0
    return out


def emit_headline(chip):
    """Print the ONE stdout JSON line from whatever arms completed.

    Called exactly once — normally right after the graded arms (before the
    detail arms, so a slow detail arm cannot starve the round of its
    number), or early from the SIGTERM/SIGALRM backstops."""
    global _headline_emitted
    if _headline_emitted:
        return
    _headline_emitted = True
    r64 = _results.get("fwd_d64_int8_full")
    r128 = _results.get("fwd_d128_int8_full")
    r256 = _results.get("fwd_d256_int8_full")
    r_fb = _results.get("fwd_bwd_d256_int8_full")
    graded = [r for r in (r64, r128, r256) if r]
    mean_tflops = (
        sum(r["tflops"] for r in graded) / len(graded)
        if graded else (r_fb["tflops"] if r_fb else 0.0)
    )
    vs_terms = [r["util"] / REFERENCE_ALU_FRACTION for r in graded]
    if r_fb:
        vs_terms.append(r_fb["util"] / REFERENCE_FWD_BWD_FRACTION)
    vs = sum(vs_terms) / len(vs_terms) if vs_terms else 0.0

    def _fmt(r, label):
        if not r:
            return f"{label} SKIPPED"
        gate = f"<{r['rel_gate']}" if r.get("rel_gate") else ""
        flag = "" if r.get("rel_ok", True) else " GATE-FAIL"
        return (
            f"{label} {r['tflops']} TF/s util {r['util']} "
            f"rel-err(L2,N(0,1) inputs) {r['rel_err']}{gate}{flag}"
        )

    parts = [
        (
            f"quantized flash-attn seq {SEQ} ({chip.name}), graded on "
            "FULL (unmasked) at d=64/128/256 like the reference's own "
            "benchmark table (SquareAttentionTest, maskType .none); util "
            "vs full chip peak; causal rates in detail rows"
        ),
        _fmt(r64, "fwd d=64 int8-KV (packed layout)"),
        _fmt(r128, "fwd d=128 int8-KV (folded)"),
        _fmt(r256, "fwd d=256 int8-KV (fullint)"),
        (
            f"fwd+bwd d=256 fullint fwd+bwd {r_fb['tflops']} TF/s "
            f"util {r_fb['util']}"
            if r_fb else "fwd+bwd SKIPPED"
        ),
    ]
    if _skipped:
        parts.append("skips: " + ",".join(_skipped))
    print(
        json.dumps(
            {
                "metric": "; ".join(parts),
                "value": round(mean_tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(vs, 4),
            }
        ),
        flush=True,
    )


def main():
    from metal_flash_attention_plus_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()  # warm compiles across processes/rounds
    chip = detect_chip()
    _calibrate_measurement()

    def _bail(signum, frame):
        raise _Deadline(signum)

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(int(BUDGET_S + 60))

    try:
        # Graded arms, priority order — FULL (unmasked) phases: the
        # reference's utilization tables come from
        # SquareAttentionTest.testPerformance with a DEFAULT descriptor
        # (maskType .none), so FULL is the like-for-like comparison.
        # Causal rates stay as detail rows.
        # ALL FOUR GRADED arms first, most important first — the fwd+bwd
        # arm IS the BASELINE.json north-star metric ("quantized
        # flash-attention fwd+bwd at >=85% of roofline"), so it leads;
        # then the fwd arms by head dim descending.  Under a congestion
        # spell compiles alone can eat 300+ s per arm, so the ordering
        # decides which arms survive the budget.  (Round-5 evidence —
        # exp38/exp40 built grad executables across five sequential arms
        # without poisoning later allocations — retired the r4
        # fwd+bwd-dead-last rule; the arms after it carry transient-retry
        # logic regardless.)
        _arm(
            "fwd_bwd_d256_int8_full", 110,
            lambda: run_fwd_bwd_config(256, 4, chip),
        )
        _arm(
            "fwd_d256_int8_full", 100,
            lambda: run_config(
                256, 4, 8, chip, gate_key="int8", causal=False,
                pipeline="fullint", b2=16),
        )
        _arm(
            "fwd_d128_int8_full", 80,
            lambda: run_config(
                128, 8, 8, chip, gate_key="int8", causal=False,
                pipeline="folded", b2=16),
        )
        _arm(
            "fwd_d64_int8_full", 60,
            lambda: run_config(
                64, 8, 8, chip, gate_key="int8", causal=False,
                pipeline="packed", b2=16),
        )
        # Headline emits HERE — a slow detail arm can no longer starve
        # the round of its number (finally still covers early bail-outs).
        emit_headline(chip)
        # Detail arms, in priority order: the bandwidth-bound decode
        # regime (the reference's 2.5×/3.0× claim), then causal rates.
        _arm("paged_decode_32k", 110, run_bandwidth_arm)
        _arm(
            "fwd_d64_int8_causal", 60,
            lambda: run_config(64, 8, 8, chip, gate_key="int8"),
        )
        # The int4-budget detail arm is K-int4 + V-int8: the reference's
        # published int4 accuracy (0.0206 rel err, GLUON doc) is
        # consistent with a K-side-only int4 measurement (docs/
        # perf_notes.md "int4 error anatomy") — K4V8 dominates pure
        # int4-KV on BOTH speed and error.
        _arm(
            "fwd_d256_k4v8_causal", 60,
            lambda: run_config(256, 4, 4, chip, bits_v=8, gate_key="k4v8"),
        )
        _arm(
            "fwd_d256_int4_causal", 60,
            lambda: run_config(256, 4, 4, chip, gate_key="int4"),
        )
    except _Deadline:
        print("deadline hit — emitting partial headline", file=sys.stderr)
    finally:
        signal.alarm(0)
        emit_headline(chip)
        print(
            f"bench done in {time.monotonic() - _T0:.0f}s "
            f"(budget {BUDGET_S:.0f}s); skips: {_skipped or 'none'}",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
