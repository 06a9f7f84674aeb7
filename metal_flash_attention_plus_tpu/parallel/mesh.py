"""Device-mesh construction and canonical axis names.

The reference's "backend" is one Metal device + command queue
(``Utilities/MTLContext.swift:10-20``).  The TPU-native equivalent is a
``jax.sharding.Mesh`` whose axes carry the parallelism strategies the
north star demands (SURVEY.md §2.5):

- ``data``    — data parallelism (batch).  Rides DCN across slices.
- ``model``   — tensor parallelism (attention heads, MLP hidden, vocab).
  Should map to an ICI-adjacent axis: its collectives (psum after o-proj /
  down-proj) are latency-critical.
- ``context`` — sequence/context parallelism (ring attention, Ulysses).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    """Canonical axis-name bundle so every module agrees on spelling."""

    data: str = "data"
    model: str = "model"
    context: str = "context"

    @property
    def all(self):
        return (self.data, self.model, self.context)


AXES = MeshAxes()


def make_mesh(
    data: int = 1,
    model: int = 1,
    context: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axes: MeshAxes = AXES,
) -> Mesh:
    """Build a (data, model, context) mesh over the given (or all) devices.

    ``jax.make_mesh`` orders axes so the *last* mesh dimension maps to the
    most-adjacent devices; ``model`` and ``context`` carry the
    latency-critical collectives, so they go last.
    """
    shape = (data, model, context)
    n = int(np.prod(shape))
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"mesh {shape} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, (axes.data, axes.model, axes.context))


def batch_sharding(mesh: Mesh, axes: MeshAxes = AXES) -> NamedSharding:
    """[B, S, ...] batches: B over data, S over context."""
    return NamedSharding(mesh, P(axes.data, axes.context))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
