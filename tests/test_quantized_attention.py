"""Quantized-KV flash attention vs goldens.

Two-level validation mirroring the reference's quantized tests
(``QuantizedAttentionTest.swift``): (1) the kernel must match the dense
reference run on DEQUANTIZED K/V tightly (the kernel math itself adds no
quantization error); (2) end-to-end relative error vs unquantized fp32
attention within the reference's gates (INT8 < 0.25; we see ~0.01)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention.masking import (
    CAUSAL,
    FULL,
    MaskKind,
    MaskSpec,
    sliding_window,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (
    quantized_flash_attention,
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
    reference_attention_vjp,
)

ROW8 = QuantConfig(
    bits=8, granularity=QuantGranularity.ROW, strategy=QuantStrategy.CENTERED
)
TEN8 = QuantConfig(bits=8)
ROW4 = QuantConfig(
    bits=4, granularity=QuantGranularity.ROW, strategy=QuantStrategy.CENTERED
)


def _data(b=1, hq=4, hkv=2, sq=256, skv=256, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, hq, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, skv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, skv, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("cfg", [ROW8, TEN8, ROW4], ids=["row8", "tensor8", "row4"])
@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
def test_matches_dequantized_golden(cfg, mask):
    q, k, v = _data()
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    o, l = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, l_ref = reference_attention(
        q, kq.dequantize(), vq.dequantize(), mask=mask
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1e-5)


def test_rel_error_gates_vs_fp32():
    q, k, v = _data(seed=3)
    o_fp, _ = reference_attention(q, k, v, mask=CAUSAL)

    def rel_kv(cfg_k, cfg_v):
        kq, vq = quantize(k, cfg_k), quantize(v, cfg_v)
        o, _ = quantized_flash_attention_forward(q, kq, vq, mask=CAUSAL)
        return float(jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp))

    def rel(cfg):
        return rel_kv(cfg, cfg)

    assert rel(ROW8) < 0.05  # reference gate: FP16-class < 0.05
    # int4-specific gates at the measured information-theoretic floor
    # (docs/perf_notes.md "int4 error anatomy": per-element int4 noise is
    # ~0.08-0.16 rel on iid data — the reference's blanket 0.25 INT8 gate
    # would hide a 2x regression).  K4-only (the reference's honest 0.0206
    # config class) must beat full int4-KV, and both must sit near their
    # floors, not merely under 0.25.
    r_k4v8 = rel_kv(ROW4, ROW8)
    r_int4 = rel(ROW4)
    assert r_k4v8 < 0.12, r_k4v8  # K-side int4 + int8 V
    assert r_int4 < 0.20, r_int4  # full int4-KV: V error passes undamped
    assert r_k4v8 < r_int4


def test_sliding_window_and_ragged():
    q, k, v = _data(sq=200, skv=200, seed=5)
    kq, vq = quantize(k, ROW8), quantize(v, ROW8)
    mask = sliding_window(64)
    o, _ = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, _ = reference_attention(
        q, kq.dequantize(), vq.dequantize(), mask=mask
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)


def test_bias_and_grads():
    q, k, v = _data(seed=7)
    kq, vq = quantize(k, ROW8), quantize(v, ROW8)
    bias = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 256, 256), jnp.float32)
    kd, vd = kq.dequantize(), vq.dequantize()

    def f(q, bias):
        return jnp.sum(
            quantized_flash_attention(q, kq, vq, bias, mask=CAUSAL) ** 2
        )

    def f_ref(q, bias):
        return jnp.sum(
            reference_attention(q, kd, vd, mask=CAUSAL, bias=bias)[0] ** 2
        )

    val, (dq, db) = jax.value_and_grad(f, argnums=(0, 1))(q, bias)
    val_r, (dq_r, db_r) = jax.value_and_grad(f_ref, argnums=(0, 1))(q, bias)
    np.testing.assert_allclose(float(val), float(val_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_r), atol=2e-4)


def test_int4_head_dims():
    for d in (64, 128):
        q, k, v = _data(d=d, seed=d)
        kq, vq = quantize(k, ROW4), quantize(v, ROW4)
        o, _ = quantized_flash_attention_forward(q, kq, vq, mask=CAUSAL)
        o_ref, _ = reference_attention(
            q, kq.dequantize(), vq.dequantize(), mask=CAUSAL
        )
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)


def test_activation_quantized_scores():
    """quantize_q: int8 Q×K scores via the int8 MXU path — must match the
    dense reference on (fake-quantized Q, dequantized K/V) exactly, and
    stay within the int8 gate vs fp32."""
    q, k, v = _data(seed=13)
    sym8 = QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.SYMMETRIC,
    )
    kq, vq = quantize(k, sym8), quantize(v, sym8)
    o, l = quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL, quantize_q=True
    )
    # Golden: quantize q the same way on the host, then dense attention.
    absmax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
    qsc = jnp.maximum(absmax, 1e-12) / 127.0
    q_fake = jnp.clip(jnp.round(q / qsc), -128, 127) * qsc
    o_ref, l_ref = reference_attention(
        q_fake, kq.dequantize(), vq.dequantize(), mask=CAUSAL
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1e-4)

    o_fp, _ = reference_attention(q, k, v, mask=CAUSAL)
    rel = float(jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp))
    assert rel < 0.05, rel


def test_activation_quantization_requires_symmetric():
    q, k, v = _data(seed=14)
    kq, vq = quantize(k, ROW8), quantize(v, ROW8)  # CENTERED → zp != 0
    with pytest.raises(ValueError, match="SYMMETRIC"):
        quantized_flash_attention_forward(
            q, kq, vq, mask=CAUSAL, quantize_q=True
        )


# ---------------------------------------------------------------------------
# Quantized backward dK/dV (dequantizing dKV kernel) — VERDICT r1 item 3.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cfg", [ROW8, ROW4], ids=["row8", "row4"])
@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
def test_qat_backward_dkv_matches_reference(cfg, mask):
    """QAT grads (STE to float masters) == reference grads on dequantized
    K/V — the dequantizing dKV kernel at the reference's quantized gate
    (rel err < 0.25; the kernel math itself is near-exact)."""
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_qat,
    )
    from metal_flash_attention_plus_tpu.quant.tensor import dequantize

    q, k, v = _data(hq=4, hkv=2)  # GQA group reduction in the dKV kernel
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    kd, vd = dequantize(kq), dequantize(vq)

    def loss(q_, k_, v_):
        return jnp.sum(
            quantized_flash_attention_qat(q_, k_, v_, cfg, mask) ** 2
        )

    def loss_ref(q_, kd_, vd_):
        return jnp.sum(reference_attention(q_, kd_, vd_, mask=mask)[0] ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, kd, vd)
    for name, a, b in zip("qkv", g, gr):
        rel = float(
            jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9)
        )
        assert rel < 0.05, (name, rel)


@pytest.mark.slow
def test_scale_zero_point_cotangents_finite_diff():
    """quantized_flash_attention now returns exact cotangents for the K/V
    scale arrays (chained through the dequantizing dKV kernel); check the
    analytic dscale against central finite differences."""
    import dataclasses

    q, k, v = _data(hq=2, hkv=2, sq=128, skv=128)
    kq, vq = quantize(k, ROW8), quantize(v, ROW8)

    def loss(scale_arr):
        k2 = dataclasses.replace(kq, scale=scale_arr)
        return jnp.sum(quantized_flash_attention(q, k2, vq, mask=CAUSAL) ** 2)

    g_s = jax.jit(jax.grad(loss))(kq.scale)
    eps = 1e-3
    idx = tuple([0] * kq.scale.ndim)
    fd = (loss(kq.scale.at[idx].add(eps))
          - loss(kq.scale.at[idx].add(-eps))) / (2 * eps)
    assert abs(float(g_s[idx]) - float(fd)) <= 0.05 * max(
        1.0, abs(float(fd))
    )


@pytest.mark.slow
def test_channel_v_scale_cotangents_finite_diff():
    """CHANNEL granularity (the folded pipeline's V default) through the
    differentiable path: dq flows and the per-channel scale cotangent
    matches central finite differences."""
    import dataclasses

    q, k, v = _data(hq=2, hkv=2, sq=128, skv=128)
    q = q.astype(jnp.bfloat16)  # CHANNEL V rides the folded fast path
    kq = quantize(
        k, QuantConfig(
            bits=8, granularity=QuantGranularity.TENSOR,
            strategy=QuantStrategy.SYMMETRIC,
        ),
    )
    vq = quantize(
        v, QuantConfig(
            bits=8, granularity=QuantGranularity.CHANNEL,
            strategy=QuantStrategy.SYMMETRIC,
        ),
    )

    def loss(scale_arr):
        v2 = dataclasses.replace(vq, scale=scale_arr)
        o = quantized_flash_attention(q, kq, v2, mask=CAUSAL)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_s = jax.jit(jax.grad(loss))(vq.scale)
    eps = 1e-3
    idx = (0, 0, 0, 5)
    fd = (loss(vq.scale.at[idx].add(eps))
          - loss(vq.scale.at[idx].add(-eps))) / (2 * eps)
    assert abs(float(g_s[idx]) - float(fd)) <= 0.05 * max(
        1.0, abs(float(fd))
    )


# ---------------------------------------------------------------------------
# BLOCK_2D in-kernel scales + Hadamard rotation + mixed K/V bits (r1 items
# 2/4/5).
# ---------------------------------------------------------------------------

B2D8 = QuantConfig(
    bits=8, granularity=QuantGranularity.BLOCK_2D,
    strategy=QuantStrategy.CENTERED, block_rows=1, block_size=32,
)
B2D8R = QuantConfig(
    bits=8, granularity=QuantGranularity.BLOCK_2D,
    strategy=QuantStrategy.CENTERED, block_rows=8, block_size=32,
)
B2D4 = QuantConfig(
    bits=4, granularity=QuantGranularity.BLOCK_2D,
    strategy=QuantStrategy.CENTERED, block_rows=1, block_size=32,
)


@pytest.mark.parametrize(
    "cfg", [B2D8, B2D8R, B2D4], ids=["b1x32", "b8x32", "b1x32-int4"]
)
@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
def test_block2d_matches_dequantized_golden(cfg, mask):
    """In-kernel 2D blockwise scales (MXU-expanded) are EXACT vs the dense
    reference on dequantized K/V — reference BLOCK_2D parity
    (``AttentionKernel+Accumulate.swift:451-511``)."""
    q, k, v = _data(d=128)
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    o, _ = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, _ = reference_attention(
        q, kq.dequantize(), vq.dequantize(), mask=mask
    )
    assert float(jnp.max(jnp.abs(o - o_ref))) < 3e-5


@pytest.mark.parametrize(
    "cfg",
    [B2D8, pytest.param(B2D8R, marks=pytest.mark.slow),
     pytest.param(B2D4, marks=pytest.mark.slow)],
    ids=["b1x32", "b8x32", "b1x32-int4"],
)
def test_block2d_backward_matches_dequantized_golden(cfg):
    """BLOCK_2D scales run in BOTH backward kernels too (closing VERDICT
    r1's 'bwd runs ROW/TENSOR only'): dq from the dequantizing dQ/dKV
    kernels matches the dense reference on dequantized K/V, and the
    per-block scale cotangents check out against finite differences."""
    import dataclasses

    q, k, v = _data(d=128)
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    kd, vd = kq.dequantize(), vq.dequantize()

    def loss(q_):
        return jnp.sum(
            quantized_flash_attention(q_, kq, vq, mask=CAUSAL) ** 2
        )

    def loss_ref(q_):
        return jnp.sum(reference_attention(q_, kd, vd, mask=CAUSAL)[0] ** 2)

    g = jax.jit(jax.grad(loss))(q)
    gr = jax.jit(jax.grad(loss_ref))(q)
    rel = float(jnp.linalg.norm(g - gr) / (jnp.linalg.norm(gr) + 1e-9))
    assert rel < 1e-3, rel

    def loss_s(scale_arr):
        k2 = dataclasses.replace(kq, scale=scale_arr)
        return jnp.sum(
            quantized_flash_attention(q, k2, vq, mask=CAUSAL) ** 2
        )

    g_s = jax.jit(jax.grad(loss_s))(kq.scale)
    eps = 1e-3
    idx = tuple([0] * kq.scale.ndim)
    fd = (loss_s(kq.scale.at[idx].add(eps))
          - loss_s(kq.scale.at[idx].add(-eps))) / (2 * eps)
    assert abs(float(g_s[idx]) - float(fd)) <= 0.05 * max(
        1.0, abs(float(fd))
    )


def test_mixed_bits_k8_v4():
    """Per-operand bit widths: K int8 + V int4 (the production asymmetry —
    K feeds the exp-sensitive score path)."""
    q, k, v = _data(d=128)
    kq, vq = quantize(k, B2D8), quantize(v, B2D4)
    o, _ = quantized_flash_attention_forward(q, kq, vq, mask=CAUSAL)
    o_ref, _ = reference_attention(
        q, kq.dequantize(), vq.dequantize(), mask=CAUSAL
    )
    assert float(jnp.max(jnp.abs(o - o_ref))) < 3e-5
    # end-to-end: K8V4 beats uniform int4 vs the fp32 reference
    o_fp, _ = reference_attention(q, k, v, mask=CAUSAL)
    rel_mixed = float(jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp))
    kq4, vq4 = quantize(k, ROW4), quantize(v, ROW4)
    o4, _ = quantized_flash_attention_forward(q, kq4, vq4, mask=CAUSAL)
    rel_int4 = float(jnp.linalg.norm(o4 - o_fp) / jnp.linalg.norm(o_fp))
    assert rel_mixed < rel_int4


@pytest.mark.slow
def test_hadamard_rotated_kv_exact_and_outlier_win():
    """hadamard_block: rotation is exact through the kernel (Q rotated in,
    O un-rotated out) and reduces quantization error on heavy-tailed data
    (the ConvRot claim, ``HadamardRotation.swift``)."""
    from metal_flash_attention_plus_tpu.attention.quantized import (
        QuantizedAttention,
        QuantizedAttentionConfig,
    )

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    b, h, s, d = 1, 2, 256, 64
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.t(ks[1], 3.0, (b, h, s, d), jnp.float32)
    v = jax.random.t(ks[2], 3.0, (b, h, s, d), jnp.float32)
    o_fp, _ = reference_attention(q, k, v, mask=CAUSAL)

    rels = {}
    for had in (False, True):
        cfg = QuantizedAttentionConfig(
            key_bits=8, value_bits=8, hadamard=had
        )
        qa = QuantizedAttention(config=cfg, mask=CAUSAL)
        o = qa(q, k, v)
        rels[had] = float(
            jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp)
        )
    assert rels[True] < rels[False]  # outlier smoothing wins
    assert rels[True] < 0.05


# ---------------------------------------------------------------------------
# Full-integer pipeline: int8 P × int8 V — BOTH MXU dots at the int8 rate
# (the TPU realization of the reference's "INT8 = 2.5× faster" headline,
# ``README.md:291-296``).
# ---------------------------------------------------------------------------

SYMROW8 = QuantConfig(
    bits=8, granularity=QuantGranularity.ROW, strategy=QuantStrategy.SYMMETRIC
)
SYMTEN8 = QuantConfig(bits=8)  # TENSOR + SYMMETRIC defaults
CH8 = QuantConfig(
    bits=8, granularity=QuantGranularity.CHANNEL,
    strategy=QuantStrategy.SYMMETRIC,
)
CH4 = QuantConfig(
    bits=4, granularity=QuantGranularity.CHANNEL,
    strategy=QuantStrategy.SYMMETRIC,
)


def _fake_quant_q(q):
    absmax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
    qsc = jnp.maximum(absmax, 1e-12) / 127.0
    return jnp.clip(jnp.round(q / qsc), -128, 127) * qsc


@pytest.mark.parametrize(
    "kcfg", [SYMROW8, SYMTEN8], ids=["krow", "ktensor-folded"]
)
@pytest.mark.parametrize("vcfg", [CH8, SYMTEN8], ids=["vchannel", "vtensor"])
@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
def test_full_integer_pipeline(kcfg, vcfg, mask):
    """int8 Q×K scores AND int8 P×V accumulation: per-channel/tensor V
    scales fold out of the PV matmul and multiply the accumulator once at
    store.  P itself is rounded to 1/127 units, so the gate vs the
    dequantized golden is the P-rounding error only (~1e-2 rel)."""
    q, k, v = _data(seed=21)
    kq, vq = quantize(k, kcfg), quantize(v, vcfg)
    o, l = quantized_flash_attention_forward(
        q, kq, vq, mask=mask, quantize_q=True
    )
    o_ref, l_ref = reference_attention(
        _fake_quant_q(q), kq.dequantize(), vq.dequantize(), mask=mask
    )
    rel = float(jnp.linalg.norm(o - o_ref) / jnp.linalg.norm(o_ref))
    assert rel < 0.02, rel  # P-rounding only
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=0.08)
    # end-to-end vs fp32: inside the reference's int8 gate
    o_fp, _ = reference_attention(q, k, v, mask=mask)
    rel_fp = float(jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp))
    assert rel_fp < 0.05, rel_fp


@pytest.mark.parametrize("d", [64, 128], ids=["d64", "d128"])
def test_full_integer_int4_v(d):
    """int4 V in the full-integer pipeline: in-kernel nibble unpack feeds
    the int8 PV dot (ones lanes concatenated after the unpack)."""
    q, k, v = _data(d=d, seed=22)
    kq, vq = quantize(k, SYMROW8), quantize(v, CH4)
    o, _ = quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL, quantize_q=True
    )
    o_ref, _ = reference_attention(
        _fake_quant_q(q), kq.dequantize(), vq.dequantize(), mask=CAUSAL
    )
    rel = float(jnp.linalg.norm(o - o_ref) / jnp.linalg.norm(o_ref))
    assert rel < 0.02, rel


def test_full_integer_int4_k():
    """int4 K with quantize_q: in-kernel nibble unpack feeds the int8
    QK dot."""
    q, k, v = _data(seed=23)
    k4 = QuantConfig(
        bits=4, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.SYMMETRIC,
    )
    kq, vq = quantize(k, k4), quantize(v, CH8)
    o, _ = quantized_flash_attention_forward(
        q, kq, vq, mask=CAUSAL, quantize_q=True
    )
    o_ref, _ = reference_attention(
        _fake_quant_q(q), kq.dequantize(), vq.dequantize(), mask=CAUSAL
    )
    rel = float(jnp.linalg.norm(o - o_ref) / jnp.linalg.norm(o_ref))
    assert rel < 0.02, rel


def test_full_integer_ragged_window():
    q, k, v = _data(sq=200, skv=200, seed=24)
    kq, vq = quantize(k, SYMROW8), quantize(v, CH8)
    mask = sliding_window(64)
    o, _ = quantized_flash_attention_forward(
        q, kq, vq, mask=mask, quantize_q=True
    )
    o_ref, _ = reference_attention(
        _fake_quant_q(q), kq.dequantize(), vq.dequantize(), mask=mask
    )
    rel = float(jnp.linalg.norm(o - o_ref) / jnp.linalg.norm(o_ref))
    assert rel < 0.02, rel


def test_channel_v_requires_quantize_q():
    q, k, v = _data(seed=25)
    kq, vq = quantize(k, ROW8), quantize(v, CH8)
    with pytest.raises(ValueError, match="full-integer"):
        quantized_flash_attention_forward(q, kq, vq, mask=CAUSAL)


TENS8 = QuantConfig(
    bits=8, granularity=QuantGranularity.TENSOR,
    strategy=QuantStrategy.SYMMETRIC,
)


@pytest.mark.parametrize("d", [64, 128], ids=["d64-ones", "d128"])
@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
@pytest.mark.parametrize("vgran", ["tensor", "channel"])
def test_folded_int8_matches_dequantized_golden(d, mask, vgran):
    # Dequant-free fast path: symmetric TENSOR K (scale folded into the Q
    # pre-scale) + symmetric TENSOR/CHANNEL V (folded at store), bf16 Q →
    # MIXED bf16×int8 MXU dots.  Must match the dense reference on
    # dequantized K/V at bf16 tolerance (the kernel adds no quant error
    # beyond the payload itself).  Measured 1.04-1.15× the bf16 kernel on
    # v5e (docs/perf_notes.md "folded int8").
    q, k, v = _data(d=d, seed=11)
    q = q.astype(jnp.bfloat16)
    vcfg = TENS8 if vgran == "tensor" else CH8
    kq, vq = quantize(k, TENS8), quantize(v, vcfg)
    o, l = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, l_ref = reference_attention(
        q,
        kq.dequantize().astype(jnp.bfloat16),
        vq.dequantize().astype(jnp.bfloat16),
        mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), atol=2.5e-2
    )
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1e-2)


def test_folded_int8_gqa_ragged():
    # GQA + rectangular + window through the folded path.
    q, k, v = _data(b=2, hq=4, hkv=2, sq=192, skv=320, d=64, seed=12)
    q = q.astype(jnp.bfloat16)
    kq, vq = quantize(k, TENS8), quantize(v, TENS8)
    mask = sliding_window(128, causal=True)
    o, l = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, l_ref = reference_attention(
        q,
        kq.dequantize().astype(jnp.bfloat16),
        vq.dequantize().astype(jnp.bfloat16),
        mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), atol=2.5e-2
    )


CH4 = QuantConfig(
    bits=4, granularity=QuantGranularity.CHANNEL,
    strategy=QuantStrategy.SYMMETRIC,
)
TENS4 = QuantConfig(
    bits=4, granularity=QuantGranularity.TENSOR,
    strategy=QuantStrategy.SYMMETRIC,
)


@pytest.mark.parametrize("d", [64, 128], ids=["d64-ones", "d128"])
@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
@pytest.mark.parametrize(
    "kcfg,vcfg",
    [(CH4, CH4), (CH4, CH8), (TENS4, TENS4)],
    ids=["k4v4-chan", "k4v8-chan", "k4v4-tensor"],
)
def test_folded_int4_matches_dequantized_golden(d, mask, kcfg, vcfg):
    # Folded path at 4 bits: symmetric CHANNEL K scales fold into Q
    # ELEMENTWISE (score = sum_d (q[d]*s_k[d])*k_int[t,d] — exact), int4
    # payloads nibble-unpack to int8 in-kernel, MIXED bf16xint8 MXU dots,
    # V scales fold at store.  Kernel must match the dense reference on
    # dequantized K/V at bf16 tolerance (quant error lives in the payload,
    # not the kernel).
    q, k, v = _data(d=d, seed=13)
    q = q.astype(jnp.bfloat16)
    kq, vq = quantize(k, kcfg), quantize(v, vcfg)
    o, l = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, l_ref = reference_attention(
        q,
        kq.dequantize().astype(jnp.bfloat16),
        vq.dequantize().astype(jnp.bfloat16),
        mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), atol=3e-2
    )
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1.5e-2)


def test_folded_int8_channel_k_gqa():
    # CHANNEL K scales through the folded path with a GQA head group:
    # the per-d fold must broadcast each KV head's scales across its
    # query-head group.
    q, k, v = _data(b=1, hq=4, hkv=2, sq=256, skv=256, d=64, seed=14)
    q = q.astype(jnp.bfloat16)
    kcfg = QuantConfig(
        bits=8, granularity=QuantGranularity.CHANNEL,
        strategy=QuantStrategy.SYMMETRIC,
    )
    kq, vq = quantize(k, kcfg), quantize(v, CH8)
    o, _ = quantized_flash_attention_forward(q, kq, vq, mask=CAUSAL)
    o_ref, _ = reference_attention(
        q,
        kq.dequantize().astype(jnp.bfloat16),
        vq.dequantize().astype(jnp.bfloat16),
        mask=CAUSAL,
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2.5e-2)


ROW8S = QuantConfig(
    bits=8, granularity=QuantGranularity.ROW,
    strategy=QuantStrategy.SYMMETRIC,
)
ROW4S = QuantConfig(
    bits=4, granularity=QuantGranularity.ROW,
    strategy=QuantStrategy.SYMMETRIC,
)


@pytest.mark.parametrize("d", [64, 128], ids=["d64", "d128"])
@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
@pytest.mark.parametrize(
    "kcfg,vcfg",
    [(ROW8S, ROW8S), (ROW4S, ROW4S), (ROW4S, CH8), (CH4, ROW8S)],
    ids=["k8v8-row", "k4v4-row", "k4row-v8chan", "k4chan-v8row"],
)
def test_folded_row_matches_dequantized_golden(d, mask, kcfg, vcfg):
    # ROW-folded path: per-token symmetric K scales cost ONE score
    # column-multiply, per-token V scales ONE P column-multiply (rowsum
    # accumulated before the scale so the softmax denominator stays
    # unscaled) — the payload never sees a dequant pass.
    q, k, v = _data(d=d, seed=15)
    q = q.astype(jnp.bfloat16)
    kq, vq = quantize(k, kcfg), quantize(v, vcfg)
    o, l = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, l_ref = reference_attention(
        q,
        kq.dequantize().astype(jnp.bfloat16),
        vq.dequantize().astype(jnp.bfloat16),
        mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), atol=3e-2
    )
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1.5e-2)


def test_folded_row_gqa_ragged_window():
    # ROW-folded with GQA + rectangular shapes + sliding window: the
    # transposed per-token scale tiles must track the KV head map and the
    # padded token tail (padded scales are 1.0; masked out anyway).
    q, k, v = _data(b=2, hq=4, hkv=2, sq=192, skv=320, d=64, seed=16)
    q = q.astype(jnp.bfloat16)
    kq, vq = quantize(k, ROW8S), quantize(v, ROW8S)
    mask = sliding_window(128, causal=True)
    o, _ = quantized_flash_attention_forward(q, kq, vq, mask=mask)
    o_ref, _ = reference_attention(
        q,
        kq.dequantize().astype(jnp.bfloat16),
        vq.dequantize().astype(jnp.bfloat16),
        mask=mask,
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-2)


@pytest.mark.parametrize(
    "kcfg,vcfg",
    [(TENS8, CH8), (CH4, CH4), (ROW8S, ROW8S), (ROW4S, CH8)],
    ids=["k8tens-v8chan", "k4v4-chan", "k8v8-row", "k4row-v8chan"],
)
def test_folded_backward_matches_dequantized_vjp(kcfg, vcfg):
    # FOLDED quantized dQ kernel (mixed bf16xint8 dots, scales folded
    # into Q / dO / the dQ store vector; ROW scales as column multiplies)
    # + CHANNEL-aware dKV scratch dequant: gradients must match the dense
    # VJP on dequantized K/V at bf16 tolerance.
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        flash_attention_forward,
    )
    from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
        flash_attention_backward,
    )

    q, k, v = _data(b=1, hq=4, hkv=2, sq=256, skv=256, d=64, seed=17)
    q = q.astype(jnp.bfloat16)
    do = jax.random.normal(
        jax.random.PRNGKey(18), q.shape, jnp.bfloat16
    )
    kq, vq = quantize(k, kcfg), quantize(v, vcfg)
    kf = kq.dequantize().astype(jnp.bfloat16)
    vf = vq.dequantize().astype(jnp.bfloat16)
    o, l = flash_attention_forward(q, kf, vf, mask=CAUSAL)
    dq, dk, dv, _ = flash_attention_backward(
        q, kq, vq, o, l, do, mask=CAUSAL
    )
    dq_r, dk_r, dv_r = reference_attention_vjp(
        q, kf, vf, do.astype(jnp.float32), mask=CAUSAL
    )[:3]
    for g, g_r in ((dq, dq_r), (dk, dk_r), (dv, dv_r)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(g_r, np.float32),
            atol=6e-2,
        )


# ---------------------------------------------------------------------------
# FULL-INTEGER backward (round 5): all five backward GEMMs on the int8 MXU.
# ---------------------------------------------------------------------------


def _fullint_bwd_arms(kcfg, vcfg, level_env, monkeypatch):
    from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
        flash_attention_backward,
        fullint_backward_supported,
    )

    if level_env is not None:
        monkeypatch.setenv("MFA_BWD_FULLINT_LEVEL", level_env)
    q, k, v = _data(b=1, hq=4, hkv=2, sq=256, skv=256, d=128, seed=21)
    q = q.astype(jnp.bfloat16)
    do = jax.random.normal(jax.random.PRNGKey(22), q.shape, jnp.bfloat16)
    kq, vq = quantize(k, kcfg), quantize(v, vcfg)
    assert fullint_backward_supported(q, kq, vq, FULL, None, None)
    o, el = quantized_flash_attention_forward(q, kq, vq, mask=FULL)
    exact = flash_attention_backward(q, kq, vq, o, el, do, mask=FULL)
    full = flash_attention_backward(
        q, kq, vq, o, el, do, mask=FULL, fullint=True
    )
    return exact, full


@pytest.mark.parametrize("level_env", [None, "2"], ids=["lvl1", "lvl2"])
@pytest.mark.parametrize(
    "kcfg,vcfg",
    [("row", "chan"),
     pytest.param("tens", "tens", marks=pytest.mark.slow)],
    ids=["rowK", "tensKV"],
)
def test_fullint_backward_matches_exact(kcfg, vcfg, level_env, monkeypatch):
    # The full-integer backward (per-token-quantized Q/dO, int8×int8 MXU
    # recompute dots; level 2 additionally row-quantizes dS/P for the
    # output dots) is an APPROXIMATION of the exact folded backward —
    # gate rel-L2 well inside the reference's own INT8 < 0.25 backward
    # tolerance (QuantizedAttentionTest.swift:651-652); measured ~0.01
    # (default level 1) / ~0.02 (level 2) on gaussian data.
    cfgs = dict(
        row=QuantConfig(
            bits=8, granularity=QuantGranularity.ROW,
            strategy=QuantStrategy.SYMMETRIC,
        ),
        chan=QuantConfig(
            bits=8, granularity=QuantGranularity.CHANNEL,
            strategy=QuantStrategy.SYMMETRIC,
        ),
        tens=QuantConfig(
            bits=8, granularity=QuantGranularity.TENSOR,
            strategy=QuantStrategy.SYMMETRIC,
        ),
    )
    exact, full = _fullint_bwd_arms(
        cfgs[kcfg], cfgs[vcfg], level_env, monkeypatch
    )
    for g_full, g_exact, name in zip(full[:3], exact[:3], "dq dk dv".split()):
        a = np.asarray(g_full, np.float32)
        b_ = np.asarray(g_exact, np.float32)
        rel = np.linalg.norm(a - b_) / np.linalg.norm(b_)
        assert rel < 0.05, f"{name} rel {rel}"


def test_fullint_backward_fallback_masked():
    # Masked problems (and non-foldable scale configs) must silently fall
    # back to the exact kernels: fullint=True output == fullint=False.
    from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (
        flash_attention_backward,
    )

    q, k, v = _data(b=1, hq=2, hkv=2, sq=256, skv=256, d=64, seed=23)
    q = q.astype(jnp.bfloat16)
    do = jax.random.normal(jax.random.PRNGKey(24), q.shape, jnp.bfloat16)
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.SYMMETRIC,
    )
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    o, el = quantized_flash_attention_forward(q, kq, vq, mask=CAUSAL)
    a = flash_attention_backward(q, kq, vq, o, el, do, mask=CAUSAL)
    b_ = flash_attention_backward(
        q, kq, vq, o, el, do, mask=CAUSAL, fullint=True
    )
    for ga, gb in zip(a[:3], b_[:3]):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_fullint_vjp_scale_cotangents():
    # Through the differentiable facade: quantize_q forward + fullint
    # backward; dq and the K/V scale cotangents stay within 5% of the
    # exact pipeline's.
    import dataclasses

    q, k, v = _data(b=1, hq=4, hkv=2, sq=256, skv=256, d=128, seed=25)
    q = q.astype(jnp.bfloat16)
    do = jax.random.normal(jax.random.PRNGKey(26), q.shape, jnp.float32)
    kq = quantize(k, QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.SYMMETRIC,
    ))
    vq = quantize(v, QuantConfig(
        bits=8, granularity=QuantGranularity.CHANNEL,
        strategy=QuantStrategy.SYMMETRIC,
    ))

    def loss(q_, ksc, vsc, qq, fi):
        k2 = dataclasses.replace(kq, scale=ksc)
        v2 = dataclasses.replace(vq, scale=vsc)
        o = quantized_flash_attention(
            q_, k2, v2, mask=FULL, quantize_q=qq, bwd_fullint=fi
        )
        return jnp.sum(o.astype(jnp.float32) * do)

    g0 = jax.grad(loss, argnums=(0, 1, 2))(q, kq.scale, vq.scale, False, False)
    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, kq.scale, vq.scale, True, True)
    for a, b_, name in zip(g1, g0, ("dq", "dks", "dvs")):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        rel = np.linalg.norm(a - b_) / np.linalg.norm(b_)
        assert rel < 0.05, f"{name} rel {rel}"


# ---------------------------------------------------------------------------
# PACKED d=64 head-pair layout — public API (round 5).
# ---------------------------------------------------------------------------


def _packed_data(b=1, hq=4, hkv=2, sq=256, skv=256, seed=31, bits=8):
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        pack_heads,
    )

    q, k, v = _data(b=b, hq=hq, hkv=hkv, sq=sq, skv=skv, d=64, seed=seed)
    q = q.astype(jnp.bfloat16)
    cfg = QuantConfig(
        bits=bits, granularity=QuantGranularity.CHANNEL,
        strategy=QuantStrategy.SYMMETRIC,
    )
    return pack_heads(q), q, quantize(k, cfg), quantize(v, cfg)


@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
@pytest.mark.parametrize(
    "bits",
    [8, pytest.param(4, marks=pytest.mark.slow)],  # int4: slow tier
    ids=["int8", "int4"],
)
def test_packed_layout_matches_reference(mask, bits):
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_forward_packed,
        unpack_heads,
    )

    qp, q, kq, vq = _packed_data(bits=bits)
    op, lp = quantized_flash_attention_forward_packed(
        qp, kq, vq, mask=mask
    )
    o = unpack_heads(op)
    o_ref, l_ref = reference_attention(
        q, kq.dequantize().astype(jnp.bfloat16),
        vq.dequantize().astype(jnp.bfloat16), mask=mask,
    )
    atol = 3e-2 if bits == 8 else 0.35
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(o_ref, np.float32), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(l_ref), atol=2e-2
    )


def test_packed_layout_causality_fixed_kv():
    # With FIXED quantized KV, a future-q-row change must not affect past
    # rows' packed outputs (kernel-level causal masking over the packed
    # score layout).
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_forward_packed,
    )

    qp, _, kq, vq = _packed_data()
    o1, _ = quantized_flash_attention_forward_packed(qp, kq, vq, mask=CAUSAL)
    qp2 = qp.at[:, :, 200:, :].add(1.0)
    o2, _ = quantized_flash_attention_forward_packed(qp2, kq, vq, mask=CAUSAL)
    np.testing.assert_array_equal(
        np.asarray(o1[:, :, :200]), np.asarray(o2[:, :, :200])
    )


def test_packed_layout_gqa_interleaved():
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_forward,
        quantized_flash_attention_forward_packed,
        pack_heads,
        unpack_heads,
    )

    q, k, v = _data(b=1, hq=4, hkv=2, sq=128, skv=128, d=64, seed=33)
    q = q.astype(jnp.bfloat16)
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.CHANNEL,
        strategy=QuantStrategy.SYMMETRIC,
    )
    kq, vq = quantize(k, cfg), quantize(v, cfg)
    for inter in (False, True):
        op, _ = quantized_flash_attention_forward_packed(
            pack_heads(q), kq, vq, mask=FULL, interleaved_kv=inter
        )
        o_ref, _ = reference_attention(
            q, kq.dequantize().astype(jnp.bfloat16),
            vq.dequantize().astype(jnp.bfloat16), mask=FULL,
            interleaved_kv=inter,
        )
        np.testing.assert_allclose(
            np.asarray(unpack_heads(op), np.float32),
            np.asarray(o_ref, np.float32), atol=3e-2,
        )


def test_packed_layout_rejects_bad_configs():
    from metal_flash_attention_plus_tpu.ops.quantized_attention import (
        quantized_flash_attention_forward_packed,
    )
    from metal_flash_attention_plus_tpu.attention.masking import (
        sliding_window,
    )

    qp, _, kq, vq = _packed_data(sq=128, skv=128)
    with pytest.raises(ValueError, match="NONE/CAUSAL"):
        quantized_flash_attention_forward_packed(
            qp, kq, vq, mask=sliding_window(32, causal=True)
        )
    row_cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.SYMMETRIC,
    )
    k_row = quantize(
        jax.random.normal(jax.random.PRNGKey(0), (1, 2, 128, 64)), row_cfg
    )
    with pytest.raises(ValueError, match="TENSOR/CHANNEL"):
        quantized_flash_attention_forward_packed(qp, k_row, vq)
