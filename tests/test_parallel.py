"""Ring-attention / Ulysses correctness vs the golden dense reference.

The reference has no distributed tests (single Metal device, SURVEY.md §4);
these are new-scope multi-device tests run on a virtual CPU mesh (8 devices,
conftest) — the "fake backend" role.  Set MFA_TPU_TESTS=1 to skip (real TPU
here is a single chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metal_flash_attention_plus_tpu.attention.masking import CAUSAL, FULL
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes
from metal_flash_attention_plus_tpu.parallel.ring import ring_attention
from metal_flash_attention_plus_tpu.parallel.ulysses import ulysses_attention
from metal_flash_attention_plus_tpu.reference.attention import (
    reference_attention,
    reference_attention_vjp,
)

BS = BlockSizes(
    block_q=128, block_kv=128,
    block_q_dkv=128, block_kv_dkv=128,
    block_q_dq=128, block_kv_dq=128,
)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs[:n]), ("context",))


def _data(b=1, hq=4, hkv=2, s=256, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_forward(causal):
    mesh = _mesh(4)
    q, k, v = _data()
    seq_spec = P(None, None, "context", None)

    f = shard_map(
        lambda q, k, v: ring_attention(
            q, k, v, "context", causal, None, BS
        ),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=False,
    )
    o = jax.jit(f)(q, k, v)
    o_ref, _ = reference_attention(
        q, k, v, mask=CAUSAL if causal else FULL
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)


def test_ring_attention_grads():
    mesh = _mesh(4)
    q, k, v = _data(seed=3)
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)
    seq_spec = P(None, None, "context", None)

    def loss(q, k, v, do):
        o = ring_attention(q, k, v, "context", True, None, BS)
        return jnp.sum(o * do)

    f = shard_map(
        lambda q, k, v, do: jax.grad(loss, argnums=(0, 1, 2))(q, k, v, do),
        mesh=mesh,
        in_specs=(seq_spec,) * 4,
        out_specs=(seq_spec,) * 3,
        check_vma=False,
    )
    dq, dk, dv = jax.jit(f)(q, k, v, do)
    dq_r, dk_r, dv_r = reference_attention_vjp(q, k, v, do, mask=CAUSAL)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), atol=5e-5)


@pytest.mark.parametrize("hkv", [4, 2])
def test_ulysses_attention(hkv):
    mesh = _mesh(4)
    q, k, v = _data(hq=8, hkv=hkv, seed=5)
    seq_spec = P(None, None, "context", None)

    f = shard_map(
        lambda q, k, v: ulysses_attention(
            q, k, v, "context", mask=CAUSAL, block_sizes=BS
        ),
        mesh=mesh,
        in_specs=(seq_spec,) * 3,
        out_specs=seq_spec,
        check_vma=False,
    )
    o = jax.jit(f)(q, k, v)
    o_ref, _ = reference_attention(q, k, v, mask=CAUSAL)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)


def test_ulysses_grads():
    mesh = _mesh(4)
    q, k, v = _data(hq=8, hkv=2, seed=7)
    do = jax.random.normal(jax.random.PRNGKey(11), q.shape, jnp.float32)
    seq_spec = P(None, None, "context", None)

    def loss(q, k, v, do):
        o = ulysses_attention(
            q, k, v, "context", mask=CAUSAL, block_sizes=BS
        )
        return jnp.sum(o * do)

    f = shard_map(
        lambda q, k, v, do: jax.grad(loss, argnums=(0, 1, 2))(q, k, v, do),
        mesh=mesh,
        in_specs=(seq_spec,) * 4,
        out_specs=(seq_spec,) * 3,
        check_vma=False,
    )
    dq, dk, dv = jax.jit(f)(q, k, v, do)
    dq_r, dk_r, dv_r = reference_attention_vjp(q, k, v, do, mask=CAUSAL)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), atol=5e-5)


@pytest.mark.slow
def test_zigzag_ring_forward_and_grads():
    from metal_flash_attention_plus_tpu.parallel.ring import (
        ring_attention_zigzag,
        zigzag_postshard,
        zigzag_preshard,
    )

    mesh = _mesh(4)
    n = 4
    q, k, v = _data(s=512, seed=21)  # 2N=8 chunks of 64 rows
    do = jax.random.normal(jax.random.PRNGKey(22), q.shape, jnp.float32)
    seq_spec = P(None, None, "context", None)

    qz = zigzag_preshard(q, n)
    kz = zigzag_preshard(k, n)
    vz = zigzag_preshard(v, n)
    doz = zigzag_preshard(do, n)

    def loss(q, k, v, do):
        o = ring_attention_zigzag(q, k, v, "context", None, BS)
        return jnp.sum(o * do), o

    f = shard_map(
        lambda q, k, v, do: jax.grad(
            lambda *a: loss(*a)[0], argnums=(0, 1, 2)
        )(q, k, v, do),
        mesh=mesh,
        in_specs=(seq_spec,) * 4,
        out_specs=(seq_spec,) * 3,
        check_vma=False,
    )
    g = shard_map(
        lambda q, k, v: ring_attention_zigzag(q, k, v, "context", None, BS),
        mesh=mesh,
        in_specs=(seq_spec,) * 3,
        out_specs=seq_spec,
        check_vma=False,
    )
    o = zigzag_postshard(jax.jit(g)(qz, kz, vz), n)
    o_ref, _ = reference_attention(q, k, v, mask=CAUSAL)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)

    dq, dk, dv = jax.jit(f)(qz, kz, vz, doz)
    dq_r, dk_r, dv_r = reference_attention_vjp(q, k, v, do, mask=CAUSAL)
    np.testing.assert_allclose(
        np.asarray(zigzag_postshard(dq, n)), np.asarray(dq_r), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(zigzag_postshard(dk, n)), np.asarray(dk_r), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(zigzag_postshard(dv, n)), np.asarray(dv_r), atol=5e-5
    )
