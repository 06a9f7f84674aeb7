"""Quantized GEMM kernels vs the jnp goldens.

Mirrors the reference's quantized-GEMM test strategy: dequantize-then-matmul
agreement (``QuantizedAttentionTest``) and the blockwise compensation
contract (``BlockwiseCompensationTest.swift:10-17``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
    compensated_matmul,
    per_row_block_sums,
    quantized_matmul,
)
from metal_flash_attention_plus_tpu.quant.compensation import (
    compensated_gemm_reference,
    dequantized_gemm_reference,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
    int8_blockwise,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize


def _data(m=256, k=512, n=384, seed=0):
    ka, kb = jax.random.split(jax.random.PRNGKey(seed))
    a = jax.random.normal(ka, (m, k), jnp.float32)
    bt = jax.random.normal(kb, (n, k), jnp.float32)
    return a, bt


CONFIGS = [
    QuantConfig(bits=8),
    QuantConfig(bits=8, granularity=QuantGranularity.ROW),
    QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.ASYMMETRIC,
    ),
    int8_blockwise(128),
    int8_blockwise(64),
    QuantConfig(bits=4),
    QuantConfig(
        bits=4, granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.CENTERED, block_size=128,
    ),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"{c.bits}b-{c.granularity.value}-{c.strategy.value}")
def test_quantized_matmul_matches_dequant(cfg):
    a, bt = _data()
    btq = quantize(bt, cfg)
    out = quantized_matmul(a, btq)
    ref = jnp.matmul(a, btq.dequantize().T, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_quantized_matmul_ragged_shapes():
    a, bt = _data(m=200, k=512, n=130)
    btq = quantize(bt, QuantConfig(bits=8))
    out = quantized_matmul(a, btq, block_m=128, block_n=128, block_k=256)
    ref = jnp.matmul(a, btq.dequantize().T, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_quantized_matmul_bf16_activation():
    a, bt = _data()
    a16 = a.astype(jnp.bfloat16)
    btq = quantize(bt, QuantConfig(bits=8))
    out = quantized_matmul(a16, btq, out_dtype=jnp.float32)
    ref = jnp.matmul(
        a16.astype(jnp.float32), btq.dequantize().T, precision="highest"
    )
    rel = float(
        jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    )
    assert rel < 0.02, rel  # bf16 MXU noise only


def test_compensated_matmul_matches_golden():
    a, bt = _data()
    cfg = int8_blockwise(128)
    aq, btq = quantize(a, cfg), quantize(bt, cfg)
    out = compensated_matmul(aq, btq)
    gold = compensated_gemm_reference(aq, btq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold), atol=1e-3)
    # And the compensation identity itself: == dequantize-then-matmul.
    deq = dequantized_gemm_reference(aq, btq)
    np.testing.assert_allclose(np.asarray(gold), np.asarray(deq), atol=1e-3)


@pytest.mark.parametrize("bs", [16, 32, 64])
def test_compensated_matmul_small_blocks(bs):
    """Sub-128 quant blocks (the reference's {16..64} contract sizes,
    ``BlockwiseQuantizationContract.swift:176-217``) through the exact
    per-element-dequant arm, vs the compensation golden."""
    a, bt = _data()
    cfg = int8_blockwise(bs)
    aq, btq = quantize(a, cfg), quantize(bt, cfg)
    out = compensated_matmul(aq, btq)
    gold = compensated_gemm_reference(aq, btq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold), atol=1e-3)


def test_compensated_matmul_small_blocks_asymmetric():
    """Nonzero zero points at bs=32: compensation identity must hold."""
    a, bt = _data(seed=3)
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.ASYMMETRIC, block_size=32,
    )
    aq, btq = quantize(a + 0.5, cfg), quantize(bt - 0.25, cfg)
    out = compensated_matmul(aq, btq)
    deq = dequantized_gemm_reference(aq, btq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(deq), atol=1e-3)


QA_CONFIGS = [
    QuantConfig(bits=8),
    QuantConfig(bits=8, granularity=QuantGranularity.ROW),
    QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.ASYMMETRIC,
    ),
    int8_blockwise(128),
    int8_blockwise(64),
    QuantConfig(bits=4),
    QuantConfig(
        bits=4, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.CENTERED,
    ),
]


@pytest.mark.parametrize(
    "cfg", QA_CONFIGS,
    ids=lambda c: f"{c.bits}b-{c.granularity.value}-{c.strategy.value}",
)
def test_quantized_matmul_qa_matches_dequant(cfg):
    """Quantized-A × float-B — the reference dequant-loads EITHER operand
    (``GEMMKernel+Multiply.swift:128-158``)."""
    a, bt = _data()
    from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
        quantized_matmul_qa,
    )

    aq = quantize(a, cfg)
    b = bt.T  # [K, N] float
    out = quantized_matmul_qa(aq, b)
    ref = jnp.matmul(aq.dequantize(), b, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_quantized_matmul_qa_folded_bf16():
    """Symmetric ROW-of-A scales + bf16 B → the folded mixed-dot kernel."""
    from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
        quantized_matmul_qa,
    )

    a, bt = _data(m=200, k=512, n=130)
    aq = quantize(a, QuantConfig(bits=8, granularity=QuantGranularity.ROW))
    b16 = bt.T.astype(jnp.bfloat16)
    out = quantized_matmul_qa(aq, b16, out_dtype=jnp.float32)
    ref = jnp.matmul(
        aq.dequantize(), b16.astype(jnp.float32), precision="highest"
    )
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # bf16 MXU noise only


def test_matmul_dispatch_qa_orientation():
    """ops.gemm.matmul routes QuantizedTensor × float through the QA path."""
    from metal_flash_attention_plus_tpu.ops.gemm import matmul

    a, bt = _data(m=128, k=256, n=128)
    aq = quantize(a, QuantConfig(bits=8))
    out = matmul(aq, bt.T)
    ref = jnp.matmul(aq.dequantize(), bt.T, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_per_row_block_sums():
    _, bt = _data()
    cfg = int8_blockwise(128)
    btq = quantize(bt, cfg)
    sums = per_row_block_sums(btq)
    q = btq.data.astype(np.int32).reshape(384, 4, 128)
    np.testing.assert_array_equal(np.asarray(sums), q.sum(axis=-1))


def test_dynamic_w8a8_matmul():
    """Runtime activation quant + int8 MXU vs an EXACT integer golden."""
    from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
        dynamic_quantized_matmul,
    )

    for strategy, gran in [
        (QuantStrategy.SYMMETRIC, QuantGranularity.ROW),
        (QuantStrategy.CENTERED, QuantGranularity.ROW),
        (QuantStrategy.SYMMETRIC, QuantGranularity.TENSOR),
    ]:
        m, n, k = 200, 257, 384
        ks = jax.random.split(jax.random.PRNGKey(42), 2)
        a = jax.random.normal(ks[0], (m, k), jnp.float32)
        w = jax.random.normal(ks[1], (n, k), jnp.float32)
        cfg = QuantConfig(bits=8, granularity=gran, strategy=strategy)
        wq = quantize(w, cfg)
        out = dynamic_quantized_matmul(a, wq)

        # Exact integer golden in float64 numpy.
        af = np.asarray(a, np.float64)
        sa = np.maximum(np.abs(af).max(1, keepdims=True), 1e-12) / 127.0
        qa = np.clip(np.round(af / sa), -127, 127)
        qb = np.asarray(wq.data, np.float64).reshape(n, k)
        sb = np.asarray(wq.scale, np.float64).reshape(-1, 1)
        zb = np.asarray(wq.zero_point, np.float64).reshape(-1, 1)
        golden = (sa * sb.T) * (qa @ qb.T - zb.T * qa.sum(1, keepdims=True))
        scale_ref = np.abs(golden).max()
        np.testing.assert_allclose(
            np.asarray(out), golden, atol=1e-5 * max(scale_ref, 1.0)
        )
        # And close to the float matmul (quantization error only).
        f_ref = af @ np.asarray(w, np.float64).T
        rel = np.linalg.norm(np.asarray(out) - f_ref) / np.linalg.norm(f_ref)
        assert rel < 0.02, (strategy, gran, rel)


def test_dynamic_w8a8_rejects_block_scales():
    from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
        dynamic_quantized_matmul,
    )

    a = jnp.ones((128, 256), jnp.float32)
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK, block_size=128
    )
    wq = quantize(jnp.ones((128, 256), jnp.float32), cfg)
    with pytest.raises(ValueError, match="ROW or TENSOR"):
        dynamic_quantized_matmul(a, wq)


def test_dynamic_w4a8_matmul():
    """int4 weights unpacked to int8 in-kernel, exact integer golden."""
    from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
        dynamic_quantized_matmul,
    )
    from metal_flash_attention_plus_tpu.quant.tensor import unpack_int4

    m, n, k = 96, 200, 512
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    a = jax.random.normal(ks[0], (m, k), jnp.float32)
    w = jax.random.normal(ks[1], (n, k), jnp.float32)
    cfg = QuantConfig(
        bits=4, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.CENTERED,
    )
    wq = quantize(w, cfg)
    out = dynamic_quantized_matmul(a, wq)

    af = np.asarray(a, np.float64)
    sa = np.maximum(np.abs(af).max(1, keepdims=True), 1e-12) / 127.0
    qa = np.clip(np.round(af / sa), -127, 127)
    qb = np.asarray(unpack_int4(wq.data), np.float64).reshape(n, k)
    sb = np.asarray(wq.scale, np.float64).reshape(-1, 1)
    zb = np.asarray(wq.zero_point, np.float64).reshape(-1, 1)
    golden = (sa * sb.T) * (qa @ qb.T - zb.T * qa.sum(1, keepdims=True))
    np.testing.assert_allclose(
        np.asarray(out), golden, atol=1e-5 * max(np.abs(golden).max(), 1.0)
    )
    f_ref = af @ np.asarray(w, np.float64).T
    rel = np.linalg.norm(np.asarray(out) - f_ref) / np.linalg.norm(f_ref)
    # Inherent int4 error: absmax/7 rowwise on N(0,1) weights predicts
    # ~13.6% rel (step 0.47σ); the reference's int4-class gate is 0.25.
    assert rel < 0.25, rel


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("gran", [QuantGranularity.ROW, QuantGranularity.TENSOR])
def test_folded_weight_only_matches_dequant(bits, gran):
    # FOLDED kernel (bf16 A + symmetric TENSOR/ROW scales): mixed
    # bf16×int8 MXU dots, scales applied once at store.  Measured 122.8
    # TF/s at M=4096 N=K=8192 — parity with XLA bf16 at half the weight
    # bytes (docs/perf_notes.md "folded int8").  Ragged N exercises the
    # store-scale padding.
    a, bt = _data(m=256, k=512, n=200, seed=7)
    a16 = a.astype(jnp.bfloat16)
    cfg = QuantConfig(
        bits=bits, granularity=gran, strategy=QuantStrategy.SYMMETRIC
    )
    btq = quantize(bt, cfg)
    out = quantized_matmul(a16, btq, out_dtype=jnp.float32)
    ref = jnp.matmul(
        a16.astype(jnp.float32), btq.dequantize().T, precision="highest"
    )
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # bf16 MXU noise only; int payload is exact


@pytest.mark.slow
def test_load_previous_c_accumulate():
    """loadPreviousC parity (``GEMMDescriptor.swift:11-94``): every
    quantized-GEMM entry point with a ``c`` operand must equal
    C + (same matmul without C), with C added in fp32."""
    from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
        compensated_matmul,
        dynamic_quantized_matmul,
        quantized_matmul,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    m, n, k = 96, 160, 256
    a = jax.random.normal(ks[0], (m, k), jnp.float32)
    b = jax.random.normal(ks[1], (n, k), jnp.float32)
    cmat = jax.random.normal(ks[2], (m, n), jnp.float32)

    # Weight-only dequant-on-load (fp32 A keeps the non-folded kernel).
    bq = quantize(b, QuantConfig(bits=8, granularity=QuantGranularity.ROW))
    base = quantized_matmul(a, bq, out_dtype=jnp.float32)
    acc = quantized_matmul(a, bq, out_dtype=jnp.float32, c=cmat)
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(base + cmat), rtol=1e-5, atol=1e-5
    )

    # Folded mixed-dot kernel (bf16 A + symmetric ROW scales).
    bq_s = quantize(
        b, QuantConfig(
            bits=8, granularity=QuantGranularity.ROW,
            strategy=QuantStrategy.SYMMETRIC,
        ),
    )
    a16 = a.astype(jnp.bfloat16)
    base = quantized_matmul(a16, bq_s, out_dtype=jnp.float32)
    acc = quantized_matmul(a16, bq_s, out_dtype=jnp.float32, c=cmat)
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(base + cmat), rtol=1e-5, atol=1e-5
    )

    # Compensated int8×int8 (128-multiple blocks → MXU arm).
    cfgb = QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK, block_size=128,
        strategy=QuantStrategy.CENTERED,
    )
    aq = quantize(a, cfgb)
    bqb = quantize(b, cfgb)
    base = compensated_matmul(aq, bqb)
    acc = compensated_matmul(aq, bqb, c=cmat)
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(base + cmat), rtol=1e-5, atol=1e-5
    )

    # Compensated sub-128 blocks (per-element dequant arm).
    cfgs = QuantConfig(
        bits=8, granularity=QuantGranularity.BLOCK, block_size=32,
        strategy=QuantStrategy.CENTERED,
    )
    aqs = quantize(a, cfgs)
    bqs = quantize(b, cfgs)
    base = compensated_matmul(aqs, bqs)
    acc = compensated_matmul(aqs, bqs, c=cmat)
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(base + cmat), rtol=1e-5, atol=1e-5
    )

    # Dynamic W8A8.
    base = dynamic_quantized_matmul(a, bq_s)
    acc = dynamic_quantized_matmul(a, bq_s, c=cmat)
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(base + cmat), rtol=1e-5, atol=1e-5
    )

    # Facade dispatch.
    from metal_flash_attention_plus_tpu.ops.gemm import matmul

    base = matmul(a, bq, out_dtype=jnp.float32)
    acc = matmul(a, bq, out_dtype=jnp.float32, c=cmat)
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(base + cmat), rtol=1e-5, atol=1e-5
    )
