"""Persistent XLA/Mosaic compilation cache.

The axon-tunneled TPU runtime's remote compiles cost 30-90 s nominally
and 100+ s in congestion spells (docs/perf_notes.md) — a benchmark run
can spend 80% of its budget compiling.  JAX's persistent compilation
cache works on this platform (verified: a cross-process warm hit loads
in ~0.2 s), so the bench/report/serving harnesses enable it against a
repo-local directory: a rehearsal run populates it and every later run
(including the driver's) starts warm.  Pure compile-time reuse — the
measured dispatches still execute on the device.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_cache(path: str = None) -> str:
    """Enable the JAX persistent compilation cache (idempotent).

    Default location: ``<repo>/.jax_cache`` (gitignored), overridable via
    ``MFA_COMPILE_CACHE``; ``MFA_COMPILE_CACHE=0`` disables entirely."""
    import jax

    env = os.environ.get("MFA_COMPILE_CACHE")
    if env == "0":
        return ""
    path = path or env or str(
        Path(__file__).resolve().parents[2] / ".jax_cache"
    )
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        return ""
    return path
