"""Blockwise zero-point compensation — golden math.

The reference's compensation formula for blockwise-quantized GEMM
(``Tests/.../BlockwiseCompensationTest.swift:10-17``):

    acc[m,n] = Σ_b s_a[b]·s_b[b]·( Sqq[b,m,n]
                                   − z_b[b]·SqA[b,m]
                                   − z_a[b]·SqB[b,n]
                                   + cnt[b]·z_a[b]·z_b[b] )

where b ranges over K-dimension blocks, Sqq is the int32 block partial
product, SqA/SqB are per-block row/column sums of the quantized operands, and
cnt is the block element count.  This is exactly the expansion of
Σ (qa − z_a)(qb − z_b) · s_a · s_b — it lets the MXU run pure int8×int8
matmuls and applies the zero-point correction per block from precomputed
sums (``precomputedSums``, ``GEMMQuantization.swift:690``).

This module is the jnp golden model; the Pallas quantized GEMM kernel
(``ops/gemm.py``) must match it.
"""

from __future__ import annotations

import jax.numpy as jnp

from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor, unpack_int4


def _payload_int32(t: QuantizedTensor) -> jnp.ndarray:
    q = unpack_int4(t.data) if t.bits == 4 else t.data
    return q.reshape(t.shape).astype(jnp.int32)


def compensated_gemm_reference(
    a: QuantizedTensor, b_t: QuantizedTensor
) -> jnp.ndarray:
    """Golden blockwise-compensated GEMM: A [M, K] × Bᵀ [N, K] → fp32 [M, N].

    Both operands are quantized with BLOCK granularity along their *last*
    dim — the shared reduction dim K.  Storing B transposed ([N, K]) is the
    natural TPU weight layout (the contraction dim is the lane dim for both
    operands) and makes the block structure identical for A and B.  Works
    for int8 and int4.
    """
    qa = _payload_int32(a)  # [M, K]
    qb = _payload_int32(b_t)  # [N, K]
    m, k = qa.shape
    n, k2 = qb.shape
    assert k == k2, (k, k2)
    bs = a.config.block_size
    assert bs == b_t.config.block_size, "operand block sizes must match"
    nb = k // bs

    sa = a.scale.reshape(nb)
    za = a.zero_point.reshape(nb).astype(jnp.int32)
    sb = b_t.scale.reshape(nb)
    zb = b_t.zero_point.reshape(nb).astype(jnp.int32)

    qa_b = qa.reshape(m, nb, bs)
    qb_b = qb.reshape(n, nb, bs)

    sqq = jnp.einsum("mbk,nbk->bmn", qa_b, qb_b)  # int32 [nb, M, N]
    sq_a = qa_b.sum(axis=-1)  # [M, nb]
    sq_b = qb_b.sum(axis=-1)  # [N, nb]

    comp = (
        sqq.astype(jnp.float32)
        - zb[:, None, None] * sq_a.T[:, :, None]
        - za[:, None, None] * sq_b.T[:, None, :]
        + (bs * za * zb)[:, None, None]
    )
    return jnp.einsum("b,bmn->mn", sa * sb, comp)


def dequantized_gemm_reference(a: QuantizedTensor, b_t: QuantizedTensor) -> jnp.ndarray:
    """Dequantize-then-matmul — must agree with the compensated path to
    float rounding (the identity the compensation formula encodes).

    ``precision='highest'`` because JAX's default matmul precision may be
    bf16-class, which would add ~2e-3 relative error and mask real bugs in
    the compensated path."""
    return jnp.matmul(
        a.dequantize(), b_t.dequantize().T, precision="highest"
    )
