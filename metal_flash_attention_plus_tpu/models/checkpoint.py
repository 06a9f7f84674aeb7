"""Training-state checkpoint/resume (orbax).

The reference has no training-state checkpoints — only QuantizedTensor
Codable serialization and the calibration JSON (SURVEY.md §5).  The TPU
build is a training/serving framework, so model+optimizer state
checkpointing is in scope: thin orbax wrappers with the sharding-aware
restore path (params restored onto whatever mesh sharding the template
carries — multi-host resume works through orbax's native machinery).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> None:
    """Save a pytree (e.g. ``{"params": ..., "opt_state": ..., "step": ...}``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree.  ``template`` (a pytree of arrays or
    ShapeDtypeStructs, optionally carrying shardings) pins structure, dtypes
    and placement; without it orbax restores as host numpy."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)
            )
            if hasattr(x, "shape")
            else x,
            template,
        )
        return ckptr.restore(path, abstract)
