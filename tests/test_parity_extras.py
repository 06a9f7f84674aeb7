"""Parity extras: capabilities/degradation, precision policy, serialization,
GEMM dispatch, and non-contiguous (strided-view) inputs.

The strided test is the TPU translation of the reference's strided-vs-
contiguous regression (``KernelRegressionTests.swift:400``): Metal needed
explicit stride buffers; on TPU a transposed/sliced jnp array must simply
produce identical results because XLA owns layout."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL
from metal_flash_attention_plus_tpu.attention.precisions import (
    PrecisionPolicy,
    TOLERANCES,
    matmul_precision,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import flash_attention
from metal_flash_attention_plus_tpu.ops.gemm import matmul
from metal_flash_attention_plus_tpu.quant.capabilities import (
    DeviceCapabilities,
    capability_report,
    resolve_strategy,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    int8_blockwise,
)
from metal_flash_attention_plus_tpu.quant.serialization import (
    load_quantized,
    save_quantized,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
)

V5E = DeviceCapabilities("tpu-v5e", True, 197.0, 394.0, 819.0)
V4 = DeviceCapabilities("tpu-v4", False, 275.0, 275.0, 1228.0)


class TestCapabilities:
    def test_compensated_path_on_int8_mxu(self):
        res = resolve_strategy(int8_blockwise(128), V5E, both_operands=True)
        assert res.use_compensated_path and not res.warnings

    def test_degrades_without_int8_mxu(self):
        res = resolve_strategy(int8_blockwise(128), V4, both_operands=True)
        assert not res.use_compensated_path
        assert any("int8 MXU" in w for w in res.warnings)

    def test_rounds_misaligned_block(self):
        res = resolve_strategy(int8_blockwise(64), V5E, both_operands=True)
        assert res.use_compensated_path
        assert res.config.block_size == 128
        assert any("rounded to 128" in w for w in res.warnings)

    def test_weight_only_untouched(self):
        req = int8_blockwise(64)
        res = resolve_strategy(req, V5E, both_operands=False)
        assert res.config == req and not res.warnings

    def test_report_renders(self):
        assert "int8 MXU path" in capability_report(V5E)


class TestPrecisionPolicy:
    def test_rules(self):
        assert matmul_precision(jnp.float32) == jax.lax.Precision.HIGHEST
        assert matmul_precision(jnp.bfloat16) == jax.lax.Precision.DEFAULT
        p = PrecisionPolicy.for_inputs(jnp.bfloat16)
        assert p.output_dtype == jnp.float32  # reference invariant
        assert p.stats_dtype == jnp.float32

    def test_force_fp32_env(self, monkeypatch):
        monkeypatch.setenv("MFA_FORCE_FP32", "1")
        assert matmul_precision(jnp.bfloat16) == jax.lax.Precision.HIGHEST
        assert PrecisionPolicy.for_inputs(jnp.bfloat16).input_dtype == jnp.float32

    def test_tolerance_ladder(self):
        assert TOLERANCES["fp32"] == 2e-5
        assert TOLERANCES["int8_rel"] == 0.25


class TestSerialization:
    @pytest.mark.parametrize(
        "cfg", [QuantConfig(bits=8), int8_blockwise(64), QuantConfig(bits=4)],
        ids=["tensor8", "block8-sums", "tensor4"],
    )
    def test_roundtrip(self, cfg):
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
        t = quantize(x, cfg)
        buf = io.BytesIO()
        save_quantized(t, buf)
        buf.seek(0)
        rt = load_quantized(buf)
        assert rt.config == t.config and rt.shape == t.shape
        np.testing.assert_array_equal(np.asarray(rt.data), np.asarray(t.data))
        np.testing.assert_array_equal(
            np.asarray(rt.scale), np.asarray(t.scale)
        )
        np.testing.assert_allclose(
            np.asarray(rt.dequantize()), np.asarray(t.dequantize())
        )

    def test_rejects_future_version(self, tmp_path):
        import json

        x = quantize(jnp.ones((8, 16)), QuantConfig(bits=8))
        p = tmp_path / "t.npz"
        save_quantized(x, str(p))
        # Corrupt the header version.
        data = dict(np.load(str(p)))
        hdr = json.loads(bytes(data["header"]).decode())
        hdr["version"] = 99
        data["header"] = np.frombuffer(
            json.dumps(hdr).encode(), dtype=np.uint8
        )
        np.savez(str(p), **data)
        with pytest.raises(ValueError, match="newer"):
            load_quantized(str(p))


class TestGEMMDispatch:
    def test_float_float(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(1), (128, 32), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(matmul(a, b)),
            np.asarray(jnp.matmul(a, b, precision="highest")),
            atol=1e-5,
        )

    def test_float_quant(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (128, 256), jnp.float32)
        bt = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.float32)
        btq = quantize(bt, QuantConfig(bits=8))
        got = matmul(a, btq)
        ref = jnp.matmul(a, btq.dequantize().T, precision="highest")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_quant_quant_compensated(self):
        cfg = int8_blockwise(128)
        a = jax.random.normal(jax.random.PRNGKey(0), (128, 256), jnp.float32)
        bt = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.float32)
        aq, btq = quantize(a, cfg), quantize(bt, cfg)
        got = matmul(aq, btq)
        ref = jnp.matmul(
            aq.dequantize(), btq.dequantize().T, precision="highest"
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-2)


class TestStridedViews:
    def test_transposed_inputs_match_contiguous(self):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (1, 4, 128, 64), jnp.float32)
        k = jax.random.normal(ks[1], (1, 4, 128, 64), jnp.float32)
        v = jax.random.normal(ks[2], (1, 4, 128, 64), jnp.float32)
        # Build non-contiguous views: permute from a [S, B, H, D] parent and
        # slice from an over-allocated parent (the reference's strided test
        # used stride buffers; here XLA must normalize layout).
        q_parent = q.transpose(2, 0, 1, 3)
        q_view = q_parent.transpose(1, 2, 0, 3)
        k_parent = jnp.pad(k, ((0, 0), (0, 0), (0, 32), (0, 0)))
        k_view = k_parent[:, :, :128, :]
        o_base = flash_attention(q, k, v, mask=CAUSAL)
        o_view = flash_attention(q_view, k_view, v, mask=CAUSAL)
        np.testing.assert_allclose(
            np.asarray(o_base), np.asarray(o_view), atol=1e-6
        )

    def test_reference_on_views(self):
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (1, 2, 96, 64), jnp.float32)
        k = jax.random.normal(ks[1], (1, 2, 96, 64), jnp.float32)
        v = jax.random.normal(ks[2], (1, 2, 96, 64), jnp.float32)
        o, _ = reference_attention(q, k, v, mask=CAUSAL)
        o2 = flash_attention(
            jnp.swapaxes(jnp.swapaxes(q, 1, 2), 1, 2), k, v, mask=CAUSAL
        )
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o), atol=2e-5)
