"""Model layer — the flagship GQA transformer built on the Pallas kernels.

The reference is a kernel library, not a model zoo; this layer exists so the
framework's kernels (flash attention, quantized GEMM, MLA) are exercised
end-to-end in a real training/serving loop, and so the distributed layer
(parallel/) has a production workload to shard.
"""

from metal_flash_attention_plus_tpu.models.transformer import (  # noqa: F401
    TransformerConfig,
    init_params,
    forward,
    loss_fn,
    make_train_step,
)
