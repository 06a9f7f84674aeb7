"""Device capability probing + graceful quantization degradation.

TPU-native analog of ``GEMM/GEMMDeviceCapabilities.swift``: the reference
probes Metal GPU-family features (``supportsBlockwiseQuantization`` = apple7+
& simdgroup ≥ 32; ``supportsBFloat16`` = apple9, :34-99) and DOWNGRADES
requested quantization strategies with warnings instead of failing
(``quantizationStrategy(requested:)``, :104-177).

TPU capability axes:
- native int8 MXU throughput (v5e/v5p: 2× bf16; v4: none — int8 matmuls run
  at bf16 rate, so the compensated int8×int8 path loses its raison d'être
  and degrades to dequant-on-load),
- int4: storage-only everywhere (no int4 MXU); always dequant-on-load,
- block-size lane alignment for the compensated path (block % 128).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
)


@dataclasses.dataclass(frozen=True)
class DeviceCapabilities:
    device_kind: str
    has_int8_mxu: bool  # int8 matmul faster than bf16 (v5e+: 2×)
    bf16_tflops: float
    int8_tops: float
    hbm_gbps: float

    @property
    def supports_compensated_int8(self) -> bool:
        return self.has_int8_mxu


def probe_capabilities() -> DeviceCapabilities:
    from metal_flash_attention_plus_tpu.utils.roofline import detect_chip

    chip = detect_chip()
    return DeviceCapabilities(
        device_kind=chip.name,
        has_int8_mxu=chip.int8_tops > chip.bf16_tflops * 1.5,
        bf16_tflops=chip.bf16_tflops,
        int8_tops=chip.int8_tops,
        hbm_gbps=chip.hbm_gbps,
    )


@dataclasses.dataclass(frozen=True)
class StrategyResolution:
    """Adjusted config + human-readable downgrades (the warnings the
    reference prints, :212-244 capability report)."""

    config: QuantConfig
    use_compensated_path: bool
    warnings: Tuple[str, ...]


def resolve_strategy(
    requested: QuantConfig,
    caps: Optional[DeviceCapabilities] = None,
    *,
    both_operands: bool = False,
) -> StrategyResolution:
    """Downgrade a requested quantization mode to what the device runs well.

    Mirrors the reference's adjustment ladder: round block sizes up to the
    alignment the kernel needs, fall back from the compensated int8 MXU path
    to dequant-on-load, never fail on a capability mismatch.
    """
    if caps is None:
        caps = probe_capabilities()
    cfg = requested
    warnings: List[str] = []
    use_comp = False

    if (
        both_operands
        and cfg.bits == 8
        and cfg.granularity == QuantGranularity.BLOCK
    ):
        bs = cfg.block_size or 0
        if not caps.has_int8_mxu:
            warnings.append(
                f"{caps.device_kind} has no fast int8 MXU path; "
                "compensated int8×int8 degrades to dequant-on-load"
            )
        elif bs % 128 != 0:
            new_bs = max(128, ((bs + 127) // 128) * 128)
            warnings.append(
                f"block_size {bs} not lane-aligned; compensated path needs "
                f"multiples of 128 — rounded to {new_bs}"
            )
            cfg = dataclasses.replace(cfg, block_size=new_bs)
            use_comp = True
        else:
            use_comp = True

    if cfg.bits == 4 and both_operands:
        warnings.append(
            "int4 has no MXU path on any TPU generation; activations stay "
            "int8/float, weights dequantize on load"
        )

    return StrategyResolution(
        config=cfg, use_compensated_path=use_comp, warnings=tuple(warnings)
    )


def capability_report(caps: Optional[DeviceCapabilities] = None) -> str:
    """Human-readable report (``quantizationCapabilityReport`` analog)."""
    if caps is None:
        caps = probe_capabilities()
    comp = "yes (2× bf16)" if caps.has_int8_mxu else "no (runs at bf16 rate)"
    return (
        f"device: {caps.device_kind}\n"
        f"  bf16 peak:        {caps.bf16_tflops:.0f} TFLOP/s\n"
        f"  int8 peak:        {caps.int8_tops:.0f} TOP/s\n"
        f"  HBM bandwidth:    {caps.hbm_gbps:.0f} GB/s\n"
        f"  int8 MXU path:    {comp}\n"
        f"  int4:             storage-only (dequant-on-load)\n"
        f"  compensated GEMM: block_size % 128 == 0 required\n"
    )
