"""Pipeline parallelism: GPipe-style fill-drain stages over a mesh axis.

New scope beyond the reference (single op → PP "n/a" in SURVEY.md §2.5;
provided so the parallelism inventory is complete).  shard_map formulation:
every device runs the same program; ``stage = axis_index(axis_name)``
selects its layer shard, and activations flow stage→stage+1 with one
``ppermute`` per schedule step.

Schedule: ``n_micro + n_stages − 1`` steps.  At step t, stage s processes
microbatch ``t − s`` (when 0 ≤ t − s < n_micro).  Stage 0 injects
microbatches; the last stage collects outputs.  Bubble fraction =
(S−1)/(M+S−1) — the standard GPipe overhead.

Why GPipe+remat rather than 1F1B: 1F1B's benefit is bounding LIVE
ACTIVATION memory by interleaving each microbatch's backward right after
its forward — but under ``jax.grad`` the forward/backward interleaving is
chosen by XLA from one traced graph, so hand-scheduling 1F1B buys nothing
the ``remat=True`` flag (per-stage, per-microbatch recomputation) doesn't
already provide with far less machinery.  A manual-VJP 1F1B would only
matter with explicit per-microbatch gradient accumulation outside
autodiff; revisit if that training loop lands.

Differentiable: the unrolled schedule is a plain traced graph (``ppermute``
transposes to reverse-direction ``ppermute``), so ``jax.grad`` through
:func:`pipeline_apply` yields exactly the unpipelined gradients —
tests/test_moe_pipeline.py pins this.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pipeline_apply(
    stage_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stage_params: jnp.ndarray,
    microbatches: jnp.ndarray,  # [n_micro, micro_size, ...] (replicated)
    axis_name: str = "pipe",
    remat: bool = False,
) -> jnp.ndarray:
    """Run ``stage_fn(params_local, x)`` as a pipeline (call inside
    shard_map).

    Args:
      stage_fn: one stage's computation on one microbatch.
      stage_params: THIS stage's parameter shard (sharded over axis_name).
      microbatches: all microbatches (replicated across the pipe axis; only
        stage 0 reads them).

    Returns [n_micro, micro_size, ...] outputs (valid on the LAST stage;
    callers psum/select as needed — shard_map out_specs can pick them up
    replicated after an explicit broadcast, see tests).
    """
    if remat:
        # Per-(stage, microbatch) rematerialization: backward recomputes a
        # stage's forward instead of keeping all n_micro·n_stages
        # activations alive — the memory term GPipe needs to scale.
        stage_fn = jax.checkpoint(stage_fn)
    n_stages = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    n_micro = microbatches.shape[0]
    x_shape = microbatches.shape[1:]
    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    outputs = jnp.zeros_like(microbatches)
    carry = jnp.zeros(x_shape, microbatches.dtype)

    for t in range(n_micro + n_stages - 1):
        m = t - stage  # microbatch this stage works on at step t
        active = jnp.logical_and(m >= 0, m < n_micro)
        # Stage 0 injects; others consume the ppermuted carry.
        m_in = jnp.clip(t, 0, n_micro - 1)
        x_in = jnp.where(stage == 0, microbatches[m_in], carry)
        y = stage_fn(stage_params, x_in)
        y = jnp.where(active, y, jnp.zeros_like(y))
        # Last stage banks its result (microbatch index m).
        is_last = stage == n_stages - 1
        bank = jnp.logical_and(active, is_last)
        slot = jnp.clip(m, 0, n_micro - 1)
        outputs = jax.lax.cond(
            bank,
            lambda o: jax.lax.dynamic_update_index_in_dim(o, y, slot, 0),
            lambda o: o,
            outputs,
        )
        carry = jax.lax.ppermute(y, axis_name, fwd_perm)

    return outputs


def broadcast_from_last_stage(
    x: jnp.ndarray, axis_name: str = "pipe"
) -> jnp.ndarray:
    """Make the last stage's value replicated across the pipe axis (so
    shard_map out_specs=P() can return it).

    Uses the replicated-cotangent psum (backward = identity): every stage
    computes the same downstream loss from the broadcast value, so a plain
    psum's transpose would multiply gradients by the axis size (the
    partial- vs replicated-cotangent distinction derived in
    parallel/spmd.py)."""
    from metal_flash_attention_plus_tpu.parallel.spmd import psum_id

    n = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    masked = jnp.where(stage == n - 1, x, jnp.zeros_like(x))
    return psum_id(masked, axis_name)
