"""GEMM dispatch API — the descriptor-level entry the reference's GEMM
engine exposes (``GEMMDescriptor`` → kernel-cache → dispatch,
``GEMM/GEMMDescriptor.swift:110-338``), resolved TPU-style.

Design decision (deliberate non-port): for FLOAT operands, XLA's native
matmul IS the tuned GEMM engine on TPU — a hand-written Pallas float GEMM
cannot beat the compiler's own emitter and would merely duplicate it, so
``matmul`` routes float×float straight to ``jnp.matmul`` with the precision
policy applied.  The Pallas kernels exist where XLA has no path: quantized
operands (dequant-on-load / compensated int8 — ops/quantized_gemm.py).
This module is the single dispatch point that picks between them, the
analog of ``GEMMKernel.register`` + ``cachedPipeline``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from metal_flash_attention_plus_tpu.attention.precisions import (
    matmul_precision,
)
from metal_flash_attention_plus_tpu.ops.quantized_gemm import (
    compensated_matmul,
    quantized_matmul,
    quantized_matmul_qa,
)
from metal_flash_attention_plus_tpu.quant.capabilities import (
    resolve_strategy,
)
from metal_flash_attention_plus_tpu.quant.params import QuantGranularity
from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor

Operand = Union[jnp.ndarray, QuantizedTensor]


@dataclasses.dataclass(frozen=True)
class GEMMDescriptor:
    """Static GEMM problem spec (``GEMMDescriptor.swift:11-94``).  Transpose
    state is expressed the TPU way: B is stored transposed ([N, K]) when
    quantized — the layout both the MXU and the block structure want."""

    m: int
    n: int
    k: int
    transpose_a: bool = False
    out_dtype: Optional[jnp.dtype] = None


def matmul(
    a: Operand,
    b: Operand,
    *,
    descriptor: Optional[GEMMDescriptor] = None,
    out_dtype: Optional[jnp.dtype] = None,
    c: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatch A×B by operand kinds.

    - float × float          → XLA matmul (precision policy applied).
    - float × QuantizedTensor → dequant-on-load Pallas kernel (B is [N, K]).
    - QuantizedTensor × float → dequant-on-load on A (the reference loads
      EITHER operand quantized, ``GEMMKernel+Multiply.swift:128-158``).
    - QuantizedTensor × QuantizedTensor → compensated int8 MXU kernel when
      the device + block layout support it (capability degradation
      otherwise: dequantize A, use the dequant-on-load path).

    ``c``: optional [M, N] accumulate-into-C operand (the reference's
    ``loadPreviousC``, ``GEMMDescriptor.swift:11-94``): result = c + A·B,
    with C added in fp32 in the kernels' store epilogues.
    """
    a_q = isinstance(a, QuantizedTensor)
    b_q = isinstance(b, QuantizedTensor)
    if descriptor is not None and descriptor.transpose_a and not a_q:
        a = a.T

    if not a_q and not b_q:
        out = jnp.matmul(a, b, precision=matmul_precision(a.dtype))
        if c is not None:
            out = out + c.astype(out.dtype)
        return out.astype(out_dtype or a.dtype)

    if not a_q and b_q:
        return quantized_matmul(
            a, b, out_dtype=out_dtype, c=c, interpret=interpret
        )

    if a_q and not b_q:
        out = quantized_matmul_qa(
            a, b, out_dtype=out_dtype, interpret=interpret
        )
        if c is not None:  # qa path: epilogue add outside the kernel
            out = (out.astype(jnp.float32) + c.astype(jnp.float32)).astype(
                out.dtype
            )
        return out

    res = resolve_strategy(a.config, both_operands=True)
    if (
        res.use_compensated_path
        and b.config.granularity == QuantGranularity.BLOCK
        and a.config.block_size == b.config.block_size
    ):
        out = compensated_matmul(a, b, c=c, interpret=interpret)
        return out.astype(out_dtype or jnp.float32)
    # Degraded path: widen A once, stream B through dequant-on-load.
    a_f = a.dequantize().astype(jnp.bfloat16)
    return quantized_matmul(
        a_f, b, out_dtype=out_dtype or jnp.float32, c=c, interpret=interpret
    )
