"""Op-count / roofline model — parity with the reference's accounting.

The reference's throughput math (``README.md:128-135, 197-213``):
  forward            (2D + 5)·N²   instructions per (head, batch)
  backward dQ        (3D + 5)·N²
  backward dK/dV     (4D + 5)·N²
  fwd+bwd combined   (9D + 15)·N²
with GINSTR = GFLOP / 2 (an FMA counts as one "instruction").

We keep the same model so utilization fractions are comparable, and add the
TPU-side peak numbers needed to turn measurements into roofline fractions.
"""

from __future__ import annotations

import dataclasses


def attention_ginstrs(
    seq_q: int,
    seq_kv: int,
    head_dim: int,
    *,
    num_heads: int = 1,
    batch: int = 1,
    phase: str = "forward",
) -> float:
    """Instruction count (FMA = 1) for one attention dispatch."""
    n2 = float(seq_q) * float(seq_kv) * num_heads * batch
    d = head_dim
    per = {
        "forward": 2 * d + 5,
        "dq": 3 * d + 5,
        "dkv": 4 * d + 5,
        "backward": 7 * d + 10,  # dq + dkv
        "fwd_bwd": 9 * d + 15,
    }[phase]
    return per * n2


def attention_flops(seq_q, seq_kv, head_dim, **kw) -> float:
    """FLOPs = 2 × instructions (FMA = 2 FLOPs)."""
    return 2.0 * attention_ginstrs(seq_q, seq_kv, head_dim, **kw)


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Peak numbers for roofline fractions."""

    name: str
    bf16_tflops: float
    int8_tops: float
    hbm_gbps: float


# Public spec-sheet numbers.
TPU_V5E = ChipSpec(name="tpu-v5e", bf16_tflops=197.0, int8_tops=394.0, hbm_gbps=819.0)
TPU_V4 = ChipSpec(name="tpu-v4", bf16_tflops=275.0, int8_tops=275.0, hbm_gbps=1228.0)
TPU_V5P = ChipSpec(name="tpu-v5p", bf16_tflops=459.0, int8_tops=918.0, hbm_gbps=2765.0)


def detect_chip() -> ChipSpec:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return TPU_V5E
    if "v5p" in kind or "v5" in kind:
        return TPU_V5P
    if "v4" in kind:
        return TPU_V4
    return TPU_V5E


def utilization(measured_tflops: float, chip: ChipSpec, dtype_bits: int = 16) -> float:
    peak = chip.int8_tops if dtype_bits <= 8 else chip.bf16_tflops
    return measured_tflops / peak
