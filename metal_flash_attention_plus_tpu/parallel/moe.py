"""Expert parallelism: top-k routed MoE layer over a mesh axis.

New scope beyond the reference (it has no MoE; SURVEY.md §2.5 marked EP
"n/a" — the framework provides it anyway so the parallelism inventory is
complete).  GShard-shaped implementation:

- top-k (default 2) softmax gating with per-expert CAPACITY buffers —
  fixed shapes are non-negotiable under jit, so each expert accepts at most
  ``capacity`` tokens per device and overflow tokens are dropped from that
  expert (their gate weight is lost; with capacity_factor ≥ k and balanced
  routing, drops are rare).
- dispatch/combine as one-hot einsums (the standard dense formulation —
  MXU-friendly, no gathers).
- EP over ``axis_name``: each device holds E/ep experts' FFN weights; two
  ``all_to_all``s move token buffers device→expert-owner→device.

Call INSIDE shard_map.  Differentiable end-to-end (einsums + all_to_all;
the top-k hard assignment is piecewise-constant, gradients flow through the
gate VALUES as usual).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_moe_params(
    key: jax.Array,
    d_model: int,
    d_ff: int,
    num_experts: int,
    dtype=jnp.float32,
):
    """Router + per-expert SwiGLU weights (expert-major for EP sharding:
    shard axis 0 over the expert mesh axis)."""
    ks = jax.random.split(key, 4)

    def dense(k, shape, fan_in):
        return (
            jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5
        ).astype(dtype)

    return dict(
        router=dense(ks[0], (d_model, num_experts), d_model).astype(
            jnp.float32
        ),
        wg=dense(ks[1], (num_experts, d_model, d_ff), d_model),
        wu=dense(ks[2], (num_experts, d_model, d_ff), d_model),
        wd=dense(ks[3], (num_experts, d_ff, d_model), d_ff),
    )


def _gating(
    logits: jnp.ndarray, num_experts: int, top_k: int, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (dispatch [T, E, C] bool-ish, combine [T, E, C] f32).

    Position within each expert's buffer = the token's rank among tokens
    routed to that expert (tokens beyond ``capacity`` are dropped for that
    expert).  Gates are renormalized over the SELECTED experts before
    capacity (dropped weight is lost, GShard convention).
    """
    t = logits.shape[0]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [T, E]
    gate_vals, expert_idx = jax.lax.top_k(probs, top_k)  # [T, k]
    gate_vals = gate_vals / jnp.maximum(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
    )

    dispatch = jnp.zeros((t, num_experts, capacity), jnp.float32)
    combine = jnp.zeros((t, num_experts, capacity), jnp.float32)
    for slot in range(top_k):
        e = expert_idx[:, slot]  # [T]
        onehot = jax.nn.one_hot(e, num_experts, dtype=jnp.float32)  # [T, E]
        # Buffer position: this token's rank among *all* tokens claiming
        # expert e (counting earlier slots' claims too, so slots of the
        # same expert never collide).
        prior = dispatch.sum(axis=2)  # [T, E] — claims from earlier slots
        rank = (jnp.cumsum(onehot, axis=0) - onehot) + jnp.sum(
            prior, axis=0, keepdims=True
        )
        pos = jnp.sum(rank * onehot, axis=1).astype(jnp.int32)  # [T]
        keep = pos < capacity
        pos_oh = jax.nn.one_hot(
            jnp.where(keep, pos, capacity), capacity + 1, dtype=jnp.float32
        )[:, :capacity]
        slot_dispatch = onehot[:, :, None] * pos_oh[:, None, :]
        dispatch = dispatch + slot_dispatch
        combine = combine + slot_dispatch * gate_vals[:, slot][:, None, None]
    return dispatch, combine


def moe_ffn(
    params,
    x: jnp.ndarray,  # [T_local, d_model] tokens on this device
    *,
    axis_name: str = "model",
    top_k: int = 2,
    capacity_factor: float = 2.0,
) -> jnp.ndarray:
    """Expert-parallel SwiGLU MoE (call inside shard_map).

    ``params['wg'/'wu'/'wd']`` arrive expert-sharded: [E/ep, ...] locally;
    ``params['router']`` replicated.
    """
    ep = jax.lax.psum(1, axis_name)
    t, d_model = x.shape
    e_local = params["wg"].shape[0]
    num_experts = e_local * ep
    capacity = max(
        1, int(capacity_factor * top_k * t / num_experts)
    )

    logits = x.astype(jnp.float32) @ params["router"]  # [T, E]
    dispatch, combine = _gating(logits, num_experts, top_k, capacity)

    # [T, E, C] × [T, d] → [E, C, d]: expert-major token buffers.
    buffers = jnp.einsum(
        "tec,td->ecd", dispatch, x.astype(jnp.float32)
    ).astype(x.dtype)

    # EP all-to-all (tiled: split axis stays, concat axis grows ×ep — the
    # well-trodden formulation; the non-tiled transpose rule miscounts
    # elements under autodiff in this JAX version): each device keeps its
    # E/ep experts' buffers, gathering every peer's contributions.
    # [E, C, d] → [E/ep, ep·C, d] (peer-major along the token axis).
    recv = jax.lax.all_to_all(
        buffers, axis_name, split_axis=0, concat_axis=1, tiled=True
    )

    h = jnp.einsum("ecd,edf->ecf", recv, params["wg"])
    u = jnp.einsum("ecd,edf->ecf", recv, params["wu"])
    y = (jax.nn.silu(h.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
        x.dtype
    )
    out_buf = jnp.einsum("ecf,efd->ecd", y, params["wd"])

    # Inverse: peer-major token blocks scatter back; expert axis regrows to
    # E in global (ep-major) order, matching the dispatch layout.
    back = jax.lax.all_to_all(
        out_buf, axis_name, split_axis=1, concat_axis=0, tiled=True
    )

    return jnp.einsum(
        "tec,ecd->td", combine, back.astype(jnp.float32)
    ).astype(x.dtype)


def moe_ffn_dense_reference(params_full, x, *, top_k: int = 2):
    """Unsharded golden: every expert computes every token, combine by
    gates (no capacity drops) — what moe_ffn converges to with ample
    capacity."""
    logits = x.astype(jnp.float32) @ params_full["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, expert_idx = jax.lax.top_k(probs, top_k)
    gate_vals = gate_vals / jnp.maximum(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
    )
    num_experts = params_full["router"].shape[1]
    gates = jnp.zeros_like(probs)
    for slot in range(top_k):
        gates = gates + jax.nn.one_hot(
            expert_idx[:, slot], num_experts
        ) * gate_vals[:, slot][:, None]

    h = jnp.einsum("td,edf->tef", x.astype(jnp.float32), params_full["wg"])
    u = jnp.einsum("td,edf->tef", x.astype(jnp.float32), params_full["wu"])
    y = jax.nn.silu(h) * u
    out = jnp.einsum("tef,efd->ted", y, params_full["wd"])
    return jnp.einsum("te,ted->td", gates, out).astype(x.dtype)
