"""metal_flash_attention_plus_tpu — a TPU-native quantized attention engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
``bghira/metal-flash-attention-plus`` (the Apple-Metal flash-attention +
quantized-GEMM kernel generator), redesigned TPU-first:

- Fused flash-attention forward + the atomic-free two-kernel backward
  (dQ-parallel and dK/dV-parallel), written in Pallas for the MXU.
- INT8/INT4 weight-and-activation quantization (per-tensor / per-row /
  blockwise with zero-point compensation) with fused on-device runtime
  quantization kernels.
- FlexAttention-style masking: causal, sliding-window, sparse row-ranges,
  block-sparse, and external additive bias masks — with block-level skipping
  (splash-style) instead of the reference's per-element bitmask machinery.
- GQA/MQA multi-head dispatch, strided/transposed views, MLA latent-KV
  decompression plus a *real* fused latent-space attention kernel (the
  reference's ``mlaCompressed`` was a stub).
- Distributed layer (new scope vs the single-device reference): mesh-sharded
  Q/K/V + KV cache via ``jax.sharding``/``shard_map``, ring-attention context
  parallelism over ``ppermute``, Ulysses all-to-all sequence parallelism.

Reference layer map: ``SURVEY.md`` §1-2; this package's layers:

    L0  reference/   pure-jnp golden semantics (analog of Network.swift)
    L1  ops/         Pallas TPU kernels (device substrate + codegen layers)
    L2  quant/       quantization data model + parameters
    L3  attention/   descriptors, heuristics, dispatch API
    L4  parallel/    mesh / collectives / ring + Ulysses context parallelism
    L5  models/      flagship transformer built on the engine
"""

__version__ = "0.1.0"

from metal_flash_attention_plus_tpu.attention.descriptor import (  # noqa: F401
    AttentionDescriptor,
    BroadcastMode,
    MultiHeadShape,
)
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: F401
    MaskSpec,
    MaskKind,
)
