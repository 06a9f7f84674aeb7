"""MLA: decompression parity and the absorbed-latent identity.

The key test: absorbed latent-space attention must equal
decompress-then-attend (the mathematical identity it implements) — the
verification the reference never had for its stubbed ``mlaCompressed``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.ops.mla import (
    mla_absorbed_attention,
    mla_decompress,
)
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
    int8_blockwise,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
)

B, H, SQ, SKV, DH, DC = 1, 4, 128, 256, 64, 256


def _setup(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (B, H, SQ, DH), jnp.float32)
    latent = jax.random.normal(ks[1], (B, SKV, DC), jnp.float32)
    w_uk = jax.random.normal(ks[2], (H, DH, DC), jnp.float32) * DC**-0.5
    w_uv = jax.random.normal(ks[3], (H, DC, DH), jnp.float32) * DC**-0.5
    return q, latent, w_uk, w_uv


def _decompressed_reference(q, latent, w_uk, w_uv, mask):
    # K_h = C·W_uk[h]ᵀ ([B,S,dc]·[dc,dh]), V_h = C·W_uv[h]
    k = jnp.einsum("bsc,hdc->bhsd", latent, w_uk, precision="highest")
    v = jnp.einsum("bsc,hcd->bhsd", latent, w_uv, precision="highest")
    o, _ = reference_attention(q, k, v, mask=mask, scale=DH**-0.5)
    return o


@pytest.mark.parametrize("mask", [FULL, CAUSAL], ids=["full", "causal"])
def test_absorbed_equals_decompressed(mask):
    q, latent, w_uk, w_uv = _setup()
    o = mla_absorbed_attention(q, latent, w_uk, w_uv, mask=mask)
    o_ref = _decompressed_reference(q, latent, w_uk, w_uv, mask)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=5e-4)


def test_decompress_matches_einsum():
    _, latent, _, _ = _setup(seed=1)
    w_uk = jax.random.normal(jax.random.PRNGKey(9), (DC, H * DH), jnp.float32)
    w_uv = jax.random.normal(jax.random.PRNGKey(10), (DC, H * DH), jnp.float32)
    k, v = mla_decompress(latent, w_uk, w_uv, H)
    k_ref = jnp.matmul(latent, w_uk, precision="highest").reshape(B, SKV, H, DH).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), atol=1e-5)
    assert v.shape == (B, H, SKV, DH)


def test_decompress_quantized_weights():
    _, latent, _, _ = _setup(seed=2)
    w = jax.random.normal(jax.random.PRNGKey(11), (DC, H * DH), jnp.float32)
    wq = quantize(w.T, int8_blockwise(128))  # stored transposed [N, K]
    k, _ = mla_decompress(latent, wq, wq, H)
    k_ref = jnp.matmul(latent, wq.dequantize().T, precision="highest").reshape(B, SKV, H, DH).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), atol=1e-3)


def test_absorbed_with_decoupled_rope():
    q, latent, w_uk, w_uv = _setup(seed=3)
    d_r = 32
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    q_rope = jax.random.normal(ks[0], (B, H, SQ, d_r), jnp.float32)
    k_rope = jax.random.normal(ks[1], (B, SKV, d_r), jnp.float32)
    o = mla_absorbed_attention(
        q, latent, w_uk, w_uv, q_rope=q_rope, k_rope=k_rope, mask=CAUSAL
    )
    # Dense reference: scores = Q_lat·Cᵀ + Q_rope·K_ropeᵀ, scale 1/sqrt(dh+dr)
    q_lat = jnp.einsum("bhsd,hdc->bhsc", q, w_uk, precision="highest")
    k_full = jnp.concatenate(
        [latent, k_rope], axis=-1
    )[:, None].repeat(H, axis=1)
    q_full = jnp.concatenate([q_lat, q_rope], axis=-1)
    v_lat = latent[:, None].repeat(H, axis=1)
    o_lat, _ = reference_attention(
        q_full, k_full,
        jnp.pad(v_lat, ((0, 0), (0, 0), (0, 0), (0, d_r))),
        mask=CAUSAL, scale=(DH + d_r) ** -0.5,
    )
    o_ref = jnp.einsum("bhsc,hcd->bhsd", o_lat[..., :DC], w_uv, precision="highest")
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=5e-4)


def test_absorbed_quantized_latent():
    q, latent, w_uk, w_uv = _setup(seed=5)
    cfg = QuantConfig(
        bits=8, granularity=QuantGranularity.ROW,
        strategy=QuantStrategy.CENTERED,
    )
    c_q = quantize(latent[:, None], cfg)  # [B, 1, Skv, dc]
    o = mla_absorbed_attention(q, c_q, w_uk, w_uv, mask=CAUSAL)
    o_fp = mla_absorbed_attention(q, latent, w_uk, w_uv, mask=CAUSAL)
    rel = float(jnp.linalg.norm(o - o_fp) / jnp.linalg.norm(o_fp))
    assert rel < 0.05, rel  # int8 gate
