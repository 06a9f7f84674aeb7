"""Expert parallelism (MoE) and pipeline parallelism vs unsharded goldens."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from metal_flash_attention_plus_tpu.parallel.moe import (
    init_moe_params,
    moe_ffn,
    moe_ffn_dense_reference,
)
from metal_flash_attention_plus_tpu.parallel.pipeline import (
    broadcast_from_last_stage,
    pipeline_apply,
)


def _mesh(n, name):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs[:n]), (name,))


class TestMoE:
    def _setup(self, num_experts=8, t=64, d=32, f=64, seed=0):
        params = init_moe_params(
            jax.random.PRNGKey(seed), d, f, num_experts
        )
        x = jax.random.normal(jax.random.PRNGKey(seed + 1), (t, d))
        return params, x

    @pytest.mark.parametrize("top_k", [1, 2])
    def test_matches_dense_reference(self, top_k):
        mesh = _mesh(4, "model")
        params, x = self._setup()
        expert_specs = dict(
            router=P(), wg=P("model"), wu=P("model"), wd=P("model")
        )
        f = shard_map(
            functools.partial(
                moe_ffn, axis_name="model", top_k=top_k,
                capacity_factor=8.0,  # ample: no drops → exact match
            ),
            mesh=mesh,
            in_specs=(expert_specs, P()),
            out_specs=P(),
            check_vma=False,
        )
        out = jax.jit(f)(params, x)
        ref = moe_ffn_dense_reference(params, x, top_k=top_k)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )

    def test_capacity_drops_tokens_not_correctness(self):
        mesh = _mesh(4, "model")
        params, x = self._setup(seed=3)
        f = shard_map(
            functools.partial(
                moe_ffn, axis_name="model", top_k=2, capacity_factor=0.5
            ),
            mesh=mesh,
            in_specs=(
                dict(router=P(), wg=P("model"), wu=P("model"), wd=P("model")),
                P(),
            ),
            out_specs=P(),
            check_vma=False,
        )
        out = jax.jit(f)(params, x)  # finite, shaped, no crash
        assert np.isfinite(np.asarray(out)).all()

    def test_grads_flow(self):
        # Real EP setup: token batch sharded over the expert axis (each
        # device owns a disjoint token shard), expert weights sharded,
        # router replicated.  Expert-sharded grads are complete as-is
        # (each expert's tokens arrive via the all-to-all); the replicated
        # router's grads need the usual psum over the axis it is
        # replicated on (same rule as parallel/spmd.py).
        mesh = _mesh(4, "model")
        params, x = self._setup(seed=5)
        specs = dict(router=P(), wg=P("model"), wu=P("model"), wd=P("model"))

        def local_grads(params, x_local):
            def local_loss(p):
                y = moe_ffn(
                    p, x_local, axis_name="model", capacity_factor=8.0
                )
                return jnp.sum(y * y)

            g = jax.grad(local_loss)(params)
            return {**g, "router": jax.lax.psum(g["router"], "model")}

        f = shard_map(
            local_grads,
            mesh=mesh, in_specs=(specs, P("model")), out_specs=specs,
            check_vma=False,
        )
        grads = jax.jit(f)(params, x)

        # Golden: per-shard dense losses summed (capacity is per-device, so
        # routing matches the sharded run shard by shard).
        def ref_loss(p):
            shards = x.reshape(4, -1, x.shape[-1])
            return sum(
                jnp.sum(moe_ffn_dense_reference(p, s) ** 2) for s in shards
            )

        ref = jax.grad(ref_loss)(params)
        np.testing.assert_allclose(
            np.asarray(grads["wd"]), np.asarray(ref["wd"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(grads["router"]), np.asarray(ref["router"]), atol=1e-4
        )


class TestPipeline:
    def _stage_fn(self, w, x):
        return jnp.tanh(x @ w)

    def _setup(self, n_stages=4, n_micro=8, m=16, d=32, seed=0):
        ws = jax.random.normal(
            jax.random.PRNGKey(seed), (n_stages, d, d)
        ) * d**-0.5
        xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (n_micro, m, d))
        return ws, xs

    def _reference(self, ws, xs):
        y = xs.reshape(-1, xs.shape[-1])
        for w in ws:
            y = jnp.tanh(y @ w)
        return y.reshape(xs.shape)

    def test_forward_matches_sequential(self):
        mesh = _mesh(4, "pipe")
        ws, xs = self._setup()

        def local(ws_local, xs):
            out = pipeline_apply(self._stage_fn, ws_local[0], xs, "pipe")
            return broadcast_from_last_stage(out, "pipe")

        f = shard_map(
            local, mesh=mesh, in_specs=(P("pipe"), P()), out_specs=P(),
            check_vma=False,
        )
        out = jax.jit(f)(ws, xs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._reference(ws, xs)), atol=1e-5
        )

    def test_grads_match_sequential(self):
        mesh = _mesh(4, "pipe")
        ws, xs = self._setup(seed=7)

        def local_loss(ws_local, xs):
            out = pipeline_apply(self._stage_fn, ws_local[0], xs, "pipe")
            out = broadcast_from_last_stage(out, "pipe")
            return jnp.sum(out * out)

        f = shard_map(
            lambda w, x: jax.grad(local_loss)(w, x),
            mesh=mesh, in_specs=(P("pipe"), P()), out_specs=P("pipe"),
            check_vma=False,
        )
        grads = jax.jit(f)(ws, xs)
        ref = jax.grad(
            lambda w: jnp.sum(self._reference(w, xs) ** 2)
        )(ws)
        np.testing.assert_allclose(
            np.asarray(grads), np.asarray(ref), atol=2e-4
        )


class TestRemat:
    def test_pipeline_remat_grads_match(self):
        mesh = _mesh(4, "pipe")
        tp = TestPipeline()
        ws, xs = tp._setup(seed=13)

        def make_loss(remat):
            def local_loss(ws_local, xs):
                out = pipeline_apply(
                    tp._stage_fn, ws_local[0], xs, "pipe", remat=remat
                )
                out = broadcast_from_last_stage(out, "pipe")
                return jnp.sum(out * out)

            return shard_map(
                lambda w, x: jax.grad(local_loss)(w, x),
                mesh=mesh, in_specs=(P("pipe"), P()), out_specs=P("pipe"),
                check_vma=False,
            )

        g_plain = jax.jit(make_loss(False))(ws, xs)
        g_remat = jax.jit(make_loss(True))(ws, xs)
        np.testing.assert_allclose(
            np.asarray(g_remat), np.asarray(g_plain), atol=1e-5
        )

    @pytest.mark.slow
    def test_spmd_remat_matches_golden(self):
        import dataclasses

        from metal_flash_attention_plus_tpu.models.transformer import (
            loss_fn,
        )
        from tests.test_spmd import CFG, _setup
        from metal_flash_attention_plus_tpu.parallel.spmd import (
            ShardingConfig, make_spmd_loss_and_grad, shard_params,
        )

        mesh, params, tokens = _setup((2, 2, 2))
        cfg_r = dataclasses.replace(CFG, remat=True)
        sc = ShardingConfig(attn_mode="ring")
        sharded = shard_params(params, mesh, cfg_r, sc)
        f = jax.jit(make_spmd_loss_and_grad(cfg_r, mesh, sc))
        loss, grads = f(sharded, tokens[:, :-1], tokens[:, 1:])
        loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, tokens, CFG)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        g = jax.tree.flatten(grads)[0]
        gr = jax.tree.flatten(grads_ref)[0]
        for a, b in zip(g, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3
            )
