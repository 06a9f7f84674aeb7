"""Long-context configs (BASELINE config 5 territory): compressed (MLA) +
sparse + quantized attention, and context-parallel MLA on the virtual mesh.

CPU tests keep shapes small but exercise the exact composition; the
tpu_only test runs the real 32K sequence on hardware."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from metal_flash_attention_plus_tpu.attention.masking import (
    CAUSAL,
    MaskKind,
    MaskSpec,
    sliding_window,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes
from metal_flash_attention_plus_tpu.ops.mla import mla_absorbed_attention
from metal_flash_attention_plus_tpu.parallel.ring import ring_attention
from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import quantize
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
)

ROW8 = QuantConfig(
    bits=8, granularity=QuantGranularity.ROW, strategy=QuantStrategy.CENTERED
)
BS128 = BlockSizes(
    block_q=128, block_kv=128, block_q_dkv=128, block_kv_dkv=128,
    block_q_dq=128, block_kv_dq=128,
)


@pytest.mark.slow
def test_mla_sparse_quantized_composition():
    """Compressed (latent) + sparse (sliding window) + quantized (int8
    latent cache) in ONE call — the config-5 composition, small shapes."""
    b, h, sq, skv, dh, dc = 1, 4, 256, 256, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, sq, dh), jnp.float32)
    latent = jax.random.normal(ks[1], (b, skv, dc), jnp.float32)
    w_uk = jax.random.normal(ks[2], (h, dh, dc), jnp.float32) * dc**-0.5
    w_uv = jax.random.normal(ks[3], (h, dc, dh), jnp.float32) * dc**-0.5
    mask = sliding_window(128, causal=True)

    c_q = quantize(latent[:, None], ROW8)
    o = mla_absorbed_attention(
        q, c_q, w_uk, w_uv, mask=mask, block_sizes=BS128
    )
    # Golden: dense attention on dequantized decompressed K/V.
    c_deq = c_q.dequantize()[:, 0]
    k = jnp.einsum("bsc,hdc->bhsd", c_deq, w_uk, precision="highest")
    v = jnp.einsum("bsc,hcd->bhsd", c_deq, w_uv, precision="highest")
    o_ref, _ = reference_attention(q, k, v, mask=mask, scale=dh**-0.5)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=5e-4)


@pytest.mark.slow
def test_mla_context_parallel_ring():
    """MLA latent attention sharded over the context axis: q_lat and the
    latent cache are ring-sharded; the MQA broadcast (Hkv=1) rides the
    ring's GQA support."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(devs[:4]), ("context",))

    b, h, s, dh, dc = 1, 4, 512, 32, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, s, dh), jnp.float32)
    latent = jax.random.normal(ks[1], (b, s, dc), jnp.float32)
    w_uk = jax.random.normal(ks[2], (h, dh, dc), jnp.float32) * dc**-0.5
    w_uv = jax.random.normal(ks[3], (h, dc, dh), jnp.float32) * dc**-0.5

    def local(q, latent):
        # Absorb W_uk locally (positions are local; absorption is per-row).
        q_lat = jnp.einsum("bhsd,hdc->bhsc", q, w_uk, precision="highest")
        c = latent[:, None]  # [b, 1, s_local, dc]
        o_lat = ring_attention(
            q_lat, c, c, "context", True, float(dh) ** -0.5, BS128
        )
        return jnp.einsum(
            "bhsc,hcd->bhsd", o_lat.astype(jnp.float32), w_uv,
            precision="highest",
        )

    spec_q = P(None, None, "context", None)
    spec_c = P(None, "context", None)
    f = shard_map(
        local, mesh=mesh, in_specs=(spec_q, spec_c), out_specs=spec_q,
        check_vma=False,
    )
    o = jax.jit(f)(q, latent)

    o_ref = mla_absorbed_attention(
        q, latent, w_uk, w_uv, mask=CAUSAL, block_sizes=BS128
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-4)


@pytest.mark.tpu_only
def test_mla_32k_on_device():
    """The real config-5 shape on hardware: 32K context, quantized latent,
    sliding-window sparsity."""
    b, h, s, dh, dc = 1, 8, 32768, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (b, h, s, dh), jnp.bfloat16)
    latent = jax.random.normal(ks[1], (b, s, dc), jnp.float32)
    w_uk = jax.random.normal(ks[2], (h, dh, dc), jnp.float32) * dc**-0.5
    w_uv = jax.random.normal(ks[3], (h, dc, dh), jnp.float32) * dc**-0.5
    c_q = quantize(latent[:, None], ROW8)
    mask = sliding_window(4096, causal=True)
    f = jax.jit(
        lambda q: mla_absorbed_attention(
            q, c_q, w_uk, w_uv, mask=mask, interpret=False
        )
    )
    o = f(q)
    assert o.shape == (b, h, s, dh)
    assert bool(jnp.isfinite(o.astype(jnp.float32)).all())