"""Quantization configuration — TPU-native analog of the reference's
``QuantizationMode`` / ``QuantizationStrategy`` / ``QuantizationParameters``
(``Sources/FlashAttention/GEMM/GEMMQuantization.swift:27-266``).

The reference's axes:
- mode: tensorWise / blockwise(blockSizeK, bothOperands) / rowWise
- strategy: legacy / asymmetric / symmetric (+ version)
- precision: INT8 / INT4 (packed 2-per-byte) from ``GEMMOperandPrecision``

TPU redesign: one frozen ``QuantConfig`` usable as a jit static argument;
scale/zero-point/sums live in a ``QuantizedTensor`` pytree.  Symmetric
requires zero_point == 0 and block sizes that are multiples of the int8 VPU
sublane (the reference requires blockSize % 8 == 0,
``GEMMQuantization.swift:101-266``; on TPU we additionally prefer multiples
of 32 lanes for int8 tiling but do not hard-require it).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class QuantGranularity(enum.Enum):
    """Scale/zero-point granularity (reference ``QuantizationMode``)."""

    TENSOR = "tensor"  # one (scale, zp) for the whole tensor
    ROW = "row"  # one (scale, zp) per row (= per token for K/V)
    CHANNEL = "channel"  # one (scale, zp) per last-dim channel, shared
    #                      across rows (per head-dim lane for V) — the
    #                      granularity whose scales FOLD OUT of the PV
    #                      matmul (O = (P·V_int)·diag(s)), enabling the
    #                      full-integer int8 attention pipeline
    BLOCK = "block"  # 1D blocks of size block_size along the last (reduction)
    #                  dim — the GEMM blockSizeK mode
    BLOCK_2D = "block_2d"  # 2D (block_rows × block_size) blocks — the
    #                        attention blockwise mode (GEMMQuantization.swift:560-677)


class QuantStrategy(enum.Enum):
    """Scale derivation (reference ``QuantizationStrategy`` + the fused
    blockwise-centered GPU path, ``GEMMBlockwiseQuantization.metal:102-193``)."""

    SYMMETRIC = "symmetric"  # scale = absmax / qmax, zp = 0
    ASYMMETRIC = "asymmetric"  # scale = (max-min)/(qmax-qmin), zp = round(-min/scale)+qmin
    CENTERED = "centered"  # mean-centered symmetric: scale = max|x-mean|/qmax,
    #                        zp = round(-mean/scale)  (the production GPU path)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Static quantization spec.

    ``bits``: 8 (int8) or 4 (packed uint8 nibbles, value = nibble - 8, the
    reference's packing — ``GEMMQuantization.swift:277-558``,
    ``GEMMHeaders.swift:740-808``).
    """

    bits: int = 8
    granularity: QuantGranularity = QuantGranularity.TENSOR
    strategy: QuantStrategy = QuantStrategy.SYMMETRIC
    block_size: Optional[int] = None  # reduction-dim block (BLOCK / BLOCK_2D)
    block_rows: Optional[int] = None  # row-dim block (BLOCK_2D only)
    compute_sums: bool = False  # precompute per-block Σq for compensation

    def __post_init__(self):
        if self.bits not in (8, 4):
            raise ValueError(f"bits must be 8 or 4, got {self.bits}")
        if self.granularity in (QuantGranularity.BLOCK, QuantGranularity.BLOCK_2D):
            if not self.block_size:
                raise ValueError(f"{self.granularity} requires block_size")
            if self.block_size % 8 != 0:
                # Parity with the reference's symmetric-mode contract
                # (GEMMQuantization.swift:101-266).
                raise ValueError("block_size must be a multiple of 8")
        if self.granularity == QuantGranularity.BLOCK_2D and not self.block_rows:
            raise ValueError("BLOCK_2D requires block_rows")

    @property
    def qmax(self) -> int:
        # int8 → 127; int4 → 7 (reference: absmax/127 and absmax/7).
        return 127 if self.bits == 8 else 7

    @property
    def qmin(self) -> int:
        return -128 if self.bits == 8 else -8

    @property
    def storage_dtype(self):
        import jax.numpy as jnp

        return jnp.int8 if self.bits == 8 else jnp.uint8


INT8_TENSOR = QuantConfig(bits=8)
INT4_TENSOR = QuantConfig(bits=4)
INT8_ROW = QuantConfig(bits=8, granularity=QuantGranularity.ROW)


def int8_blockwise(block_size: int = 64, compute_sums: bool = True) -> QuantConfig:
    return QuantConfig(
        bits=8,
        granularity=QuantGranularity.BLOCK,
        strategy=QuantStrategy.CENTERED,
        block_size=block_size,
        compute_sums=compute_sums,
    )


# Standard block sizes and selection rule, parity with
# BlockwiseQuantizationContract.swift:176-217.
STANDARD_BLOCK_SIZES = (16, 32, 64, 128, 256)
DEFAULT_BLOCK_SIZE = 64


def optimal_block_size(k_dim: int) -> int:
    """Pick a block size: prefer exact divisors of K, else minimal waste
    (parity with ``BlockwiseQuantizationConfig.optimalBlockSize``)."""
    divisors = [b for b in STANDARD_BLOCK_SIZES if k_dim % b == 0]
    if divisors:
        return max(divisors)
    waste = [(-(k_dim % -b), b) for b in STANDARD_BLOCK_SIZES]
    return min(waste)[1]
