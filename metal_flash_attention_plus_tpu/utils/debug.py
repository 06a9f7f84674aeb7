"""Debug/observability — the reference's MFA_DEBUG machinery, TPU terms.

The reference gates verbose quantization diagnostics behind ``MFA_DEBUG``
(``QuantizedAttention.swift:99-103``) and dumps every generated attention
kernel's MSL to ``/tmp/quantized_attention_kernel.metal``
(``AttentionKernel+Source.swift:139-144``).  Equivalents here:

- ``MFA_DEBUG=1`` enables :func:`log`.
- :func:`dump_lowered` writes a jitted function's lowered StableHLO — the
  artifact that plays the "generated kernel source" role on TPU — to
  ``MFA_DUMP_DIR`` (default /tmp), for diffing compiler input across
  versions.
- :func:`trace` wraps ``jax.profiler`` for on-device timelines.
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path
from typing import Optional

import jax


def debug_enabled() -> bool:
    return os.environ.get("MFA_DEBUG") == "1"


def log(*args) -> None:
    if debug_enabled():
        print("[mfa]", *args, flush=True)


def dump_lowered(
    fn, *example_args, name: str = "mfa_kernel", path: Optional[str] = None
) -> str:
    """Lower ``fn`` on example args and write the StableHLO text.

    Returns the file path.  (The analog of the reference dumping generated
    MSL on every ``createSource()`` — but opt-in, not on every call.)
    """
    lowered = jax.jit(fn).lower(*example_args)
    text = lowered.as_text()
    out_dir = Path(path or os.environ.get("MFA_DUMP_DIR", "/tmp"))
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"{name}.stablehlo.txt"
    out.write_text(text)
    log("dumped lowered IR to", out)
    return str(out)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mfa_trace"):
    """Profiler-trace context (latency accounting the reference got from
    command-buffer gpuStart/EndTime)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
