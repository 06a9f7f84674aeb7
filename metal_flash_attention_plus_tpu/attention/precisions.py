"""Precision policy — the reference's L4 precision layer, TPU terms.

``AttentionDescriptor+Precisions.swift`` spends 240 lines deriving which
operand lives at which width in memory vs registers, justified by measured
error tables.  The TPU policy is simpler because the hardware is: the MXU
accumulates fp32 natively and VMEM "registers" are typed per-op, so the
policy reduces to three decisions, all kept from the reference:

1. O, L (and D in backward) are ALWAYS fp32 in memory
   (``:127-143`` — costs little, kills whole bug classes).
2. Softmax statistics (m, l) are ALWAYS fp32 regardless of input dtype
   (the register-precision rules ``:152-242`` exist to protect exactly
   these; on TPU we just never narrow them).
3. Matmul precision follows the input dtype: fp32 inputs get
   ``Precision.HIGHEST`` (the 2e-5 gate needs true-fp32 MXU passes —
   3-pass bf16 decomposition), bf16 inputs the native bf16 MXU path.

``MFA_FORCE_FP32`` (analog of the reference's ``MFA_FORCE_NO_NATIVE_BF16``
hardware-simulation env var, ``:159-164``) forces HIGHEST everywhere —
useful to separate kernel bugs from bf16 rounding when debugging.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp


def force_fp32() -> bool:
    return os.environ.get("MFA_FORCE_FP32") == "1"


def matmul_precision(input_dtype) -> jax.lax.Precision:
    """The kernel-side rule (ops/* use this logic inline)."""
    if force_fp32() or input_dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


@dataclasses.dataclass(frozen=True)
class PrecisionPolicy:
    """Resolved per-problem precisions (the AttentionKernelDescriptor's
    memory/register precision fields, flattened to what TPU needs)."""

    input_dtype: jnp.dtype  # Q/K/V memory dtype
    output_dtype: jnp.dtype = jnp.float32  # O memory (reference: always fp32)
    stats_dtype: jnp.dtype = jnp.float32  # L, D, m, l — never narrowed
    accum_dtype: jnp.dtype = jnp.float32  # MXU accumulator

    @property
    def precision(self) -> jax.lax.Precision:
        return matmul_precision(self.input_dtype)

    @staticmethod
    def for_inputs(dtype) -> "PrecisionPolicy":
        if force_fp32():
            return PrecisionPolicy(input_dtype=jnp.float32)
        return PrecisionPolicy(input_dtype=jnp.dtype(dtype))


# The accuracy ladder the test suite enforces — the reference's tolerances
# (SquareAttentionTest.swift check block; QuantizedAttentionTest:519-520).
TOLERANCES = {
    "fp32": 2e-5,  # max abs err, O and gradients
    "mixed": 5e-2,  # bf16 inputs
    "lse": 7e-3,
    "int8_rel": 0.25,  # relative; measured ~0.01
    "int4_rel": 0.25,  # held to the reference's int8 gate; measured ~0.17
}
