"""Manual 3D-parallel (DP × TP × CP) transformer via shard_map.

This is the line-for-line sharding of ``models/transformer.py`` (the golden
single-device model), following the Megatron factoring expressed in TPU
terms (SURVEY.md §2.5; scaling-book recipe: pick a mesh, annotate, let ICI
carry the collectives):

- ``data``    — batch sharded; gradients all-reduced across it.
- ``model``   — attention heads, MLP hidden dim, and vocab sharded;
  ONE psum after the attention out-projection and ONE after the MLP
  down-projection per layer (both ride ICI).
- ``context`` — sequence sharded; attention runs as ring attention
  (``parallel/ring.py``) or Ulysses all-to-all (``parallel/ulysses.py``).

Gradient correctness by construction: no gradient ever flows through a
*plain* collective transpose.  Model-axis reductions use :func:`psum_id`
(forward ``psum``, backward identity — exact because a tensor-parallel
shard's parameters contribute to the global loss only through the local
psum operand), the logsumexp max is ``stop_gradient``'d, ring/Ulysses carry
their own custom VJPs, and the cross-device loss mean happens OUTSIDE
autodiff: we differentiate the per-device loss *sum* and then explicitly
psum gradients over every axis the parameter is replicated on.  This is
validated numerically against the golden model in tests/test_spmd.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    _merge_heads,
    _split_heads,
    rms_norm,
    rope,
)
from metal_flash_attention_plus_tpu.parallel.mesh import AXES, MeshAxes
from metal_flash_attention_plus_tpu.parallel.ring import ring_attention
from metal_flash_attention_plus_tpu.parallel.ulysses import ulysses_attention
from metal_flash_attention_plus_tpu.attention.masking import CAUSAL


# Two psum flavors with explicit, hand-derived transposes.  The distinction
# is WHAT the incoming cotangent is at the psum output:
#
# - Inside the network (attention out-proj, MLP down-proj), the residual
#   stream's cotangent is MODEL-PARTIAL: each model shard back-propagates
#   only its own vocab slice's loss contribution, and the true cotangent is
#   the sum over shards.  The psum's backward must therefore be ANOTHER
#   psum, reconstructing the full cotangent before it enters the shard's
#   tensor-parallel branch (whose parameters exist only on that shard).
#
# - At the loss head (global sumexp / target-logit reductions), every shard
#   computes the SAME global loss value from the psum result, so the
#   incoming cotangent is already the true replicated cotangent; the
#   backward is identity (a psum would double-count by the axis size).
#
# tests/test_spmd.py pins both choices numerically against jax.grad of the
# unsharded golden model.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_tp(x, axis_name):
    """Tensor-parallel reduction: forward psum, backward psum
    (partial-cotangent regime — see module comment)."""
    return jax.lax.psum(x, axis_name)


def _psum_tp_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _psum_tp_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


psum_tp.defvjp(_psum_tp_fwd, _psum_tp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_id(x, axis_name):
    """Loss-head reduction: forward psum, backward identity
    (replicated-cotangent regime — see module comment)."""
    return jax.lax.psum(x, axis_name)


def _psum_id_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _psum_id_bwd(axis_name, _, ct):
    return (ct,)


psum_id.defvjp(_psum_id_fwd, _psum_id_bwd)


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    axes: MeshAxes = AXES
    attn_mode: str = "ring"  # "ring" | "ulysses" | "local"

    def __post_init__(self):
        if self.attn_mode not in ("ring", "ulysses", "local"):
            raise ValueError(self.attn_mode)


def param_specs(cfg: TransformerConfig, sc: ShardingConfig = ShardingConfig()):
    """PartitionSpec tree matching init_params' structure."""
    m = sc.axes.model
    layer = dict(
        ln1=P(None),
        wq=P(None, m),
        wk=P(None, m),
        wv=P(None, m),
        wo=P(m, None),
        ln2=P(None),
        wg=P(None, m),
        wu=P(None, m),
        wd=P(m, None),
    )
    return dict(
        embed=P(None, None),
        layers=[dict(layer) for _ in range(cfg.num_layers)],
        ln_f=P(None),
        unembed=P(None, m),
    )


def _grad_sync_groups(cfg: TransformerConfig):
    """'dc' = psum over (data, context); 'dcm' = additionally over model
    (parameters replicated across the model axis)."""
    layer = dict(
        ln1="dcm", wq="dc", wk="dc", wv="dc", wo="dc",
        ln2="dcm", wg="dc", wu="dc", wd="dc",
    )
    return dict(
        embed="dcm",
        layers=[dict(layer) for _ in range(cfg.num_layers)],
        ln_f="dcm",
        unembed="dc",
    )


def validate_mesh(cfg: TransformerConfig, mesh: Mesh, sc: ShardingConfig):
    """Early, readable shape checks (the analog of the reference's
    broadcast-mode validation, ``MultiHeadAttentionDescriptor.swift:43-109``)."""
    ax = sc.axes
    tp = mesh.shape[ax.model]
    cp = mesh.shape[ax.context]
    if cfg.num_kv_heads % tp != 0:
        raise ValueError(
            f"num_kv_heads={cfg.num_kv_heads} must be divisible by the "
            f"model-axis size {tp} (KV-head replication across tp subgroups "
            "is not implemented)"
        )
    if cfg.num_heads % tp != 0:
        raise ValueError(
            f"num_heads={cfg.num_heads} not divisible by model axis {tp}"
        )
    if cfg.d_ff % tp != 0 or cfg.vocab_size % tp != 0:
        raise ValueError("d_ff and vocab_size must divide the model axis")
    if sc.attn_mode == "ulysses" and (cfg.num_heads // tp) % cp != 0:
        raise ValueError(
            f"ulysses: local heads {cfg.num_heads // tp} not divisible by "
            f"context axis {cp}"
        )
    if sc.attn_mode == "local" and cp != 1:
        raise ValueError("attn_mode='local' requires context axis of size 1")


def shard_params(params, mesh: Mesh, cfg, sc: ShardingConfig = ShardingConfig()):
    validate_mesh(cfg, mesh, sc)
    specs = param_specs(cfg, sc)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )


def _local_attention(q, k, v, cfg, sc: ShardingConfig):
    if sc.attn_mode == "ring":
        return ring_attention(
            q, k, v, sc.axes.context, True, None, cfg.block_sizes
        )
    if sc.attn_mode == "ulysses":
        return ulysses_attention(
            q, k, v, sc.axes.context, mask=CAUSAL,
            block_sizes=cfg.block_sizes,
        )
    # "local": context axis must be size 1.
    from metal_flash_attention_plus_tpu.ops.flash_attention import (
        flash_attention,
    )

    return flash_attention(q, k, v, mask=CAUSAL, block_sizes=cfg.block_sizes)


def local_forward(params, tokens, cfg: TransformerConfig, sc: ShardingConfig):
    """Per-device forward on local shards → local logits [b_l, s_l, V/tp]."""
    ax = sc.axes
    s_loc = tokens.shape[1]
    cp = jax.lax.axis_index(ax.context)
    positions = cp * s_loc + jnp.arange(s_loc)

    x = params["embed"][tokens]
    hd = cfg.head_dim

    def layer_fn(layer, x):
        h = rms_norm(x, layer["ln1"])
        qh, kh, vh = h @ layer["wq"], h @ layer["wk"], h @ layer["wv"]
        q = _split_heads(qh, qh.shape[-1] // hd, hd)
        k = _split_heads(kh, kh.shape[-1] // hd, hd)
        v = _split_heads(vh, vh.shape[-1] // hd, hd)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        o = _local_attention(q, k, v, cfg, sc)
        attn = _merge_heads(o.astype(x.dtype)) @ layer["wo"]
        x = x + psum_tp(attn.astype(jnp.float32), ax.model).astype(x.dtype)

        h2 = rms_norm(x, layer["ln2"])
        y = jax.nn.silu((h2 @ layer["wg"]).astype(jnp.float32)) * (
            h2 @ layer["wu"]
        ).astype(jnp.float32)
        down = y.astype(x.dtype) @ layer["wd"]
        return x + psum_tp(down.astype(jnp.float32), ax.model).astype(x.dtype)

    if cfg.remat:
        layer_fn = jax.checkpoint(layer_fn)
    for layer in params["layers"]:
        x = layer_fn(layer, x)

    hf = rms_norm(x, params["ln_f"])
    return (hf @ params["unembed"]).astype(jnp.float32)


def local_loss_sum(params, inputs, targets, cfg, sc: ShardingConfig):
    """Per-device SUM of next-token cross entropy over local tokens.

    Vocab is model-sharded, so the logsumexp and the target-logit gather are
    two-stage: local reduce + ``psum_id`` over the model axis.
    """
    ax = sc.axes
    logits = local_forward(params, inputs, cfg, sc)  # [b, s, V/tp]
    v_loc = logits.shape[-1]
    off = jax.lax.axis_index(ax.model) * v_loc

    # stop_gradient BEFORE pmax: the max-shift is a numerical constant (its
    # gradient contribution cancels in softmax), and pmax has no diff rule.
    vmax = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(logits, axis=-1)), ax.model
    )
    sumexp = psum_id(
        jnp.sum(jnp.exp(logits - vmax[..., None]), axis=-1), ax.model
    )
    lse = vmax + jnp.log(sumexp)

    in_shard = jnp.logical_and(targets >= off, targets < off + v_loc)
    idx = jnp.clip(targets - off, 0, v_loc - 1)
    tgt_local = jnp.take_along_axis(logits, idx[..., None], axis=-1)[..., 0]
    tgt = psum_id(jnp.where(in_shard, tgt_local, 0.0), ax.model)
    return jnp.sum(lse - tgt)


def make_spmd_loss_and_grad(
    cfg: TransformerConfig,
    mesh: Mesh,
    sc: ShardingConfig = ShardingConfig(),
    total_tokens: Optional[int] = None,
):
    """Build ``f(params, inputs, targets) -> (loss, grads)`` shard_mapped
    over the mesh.  ``total_tokens`` = global B·S of the *prediction*
    positions (inferred per call if None — then B, S must be static)."""
    ax = sc.axes
    specs = param_specs(cfg, sc)
    groups = _grad_sync_groups(cfg)
    batch_spec = P(ax.data, ax.context)

    def local_fn(params, inputs, targets):
        lsum, grads = jax.value_and_grad(local_loss_sum)(
            params, inputs, targets, cfg, sc
        )
        dc = (ax.data, ax.context)
        dcm = (ax.data, ax.context, ax.model)

        def sync(g, grp):
            return jax.lax.psum(g, dcm if grp == "dcm" else dc)

        grads = jax.tree.map(sync, grads, groups)
        total = jax.lax.psum(lsum, dc)
        n = total_tokens
        if n is None:
            n = inputs.shape[0] * inputs.shape[1]
            n = n * mesh.shape[ax.data] * mesh.shape[ax.context]
        loss = total / n
        grads = jax.tree.map(lambda g: g / n, grads)
        return loss, grads

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs, batch_spec, batch_spec),
        out_specs=(P(), specs),
        check_vma=False,
    )


def make_spmd_train_step(
    cfg: TransformerConfig,
    mesh: Mesh,
    optimizer,
    sc: ShardingConfig = ShardingConfig(),
):
    """Full jitted train step: shard_mapped loss+grad, optimizer outside
    (GSPMD shards the elementwise update along the param shardings)."""
    loss_and_grad = make_spmd_loss_and_grad(cfg, mesh, sc)

    @jax.jit
    def step(params, opt_state, tokens):
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        loss, grads = loss_and_grad(params, inputs, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        return params, opt_state, loss

    return step


def spmd_forward(
    params, tokens, cfg: TransformerConfig, mesh: Mesh,
    sc: ShardingConfig = ShardingConfig(),
):
    """Sharded inference forward → global logits [B, S, V]."""
    ax = sc.axes
    specs = param_specs(cfg, sc)

    def local_fn(params, tokens):
        logits = local_forward(params, tokens, cfg, sc)
        return logits

    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs, P(ax.data, ax.context)),
        # Local logits [b_l, s_l, V/tp] reassemble to global [B, S, V].
        out_specs=P(ax.data, ax.context, ax.model),
        check_vma=False,
    )
    return f(params, tokens)
