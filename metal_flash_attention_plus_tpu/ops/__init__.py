"""Pallas TPU kernels — the device-substrate + codegen layers (L1/L3)."""

from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: F401
    BlockSizes,
    flash_attention,
    flash_attention_forward,
    flash_attention_with_lse,
)
from metal_flash_attention_plus_tpu.ops.flash_attention_bwd import (  # noqa: F401
    flash_attention_backward,
)
from metal_flash_attention_plus_tpu.ops.quantized_attention import (  # noqa: F401
    quantized_flash_attention,
    quantized_flash_attention_forward,
)
from metal_flash_attention_plus_tpu.ops.quantized_gemm import (  # noqa: F401
    compensated_matmul,
    per_row_block_sums,
    quantized_matmul,
)
from metal_flash_attention_plus_tpu.ops.runtime_quantization import (  # noqa: F401
    runtime_quantize,
)
from metal_flash_attention_plus_tpu.ops.mla import (  # noqa: F401
    mla_absorbed_attention,
    mla_decompress,
)
from metal_flash_attention_plus_tpu.ops.hadamard import (  # noqa: F401
    hadamard_transform,
    rotate_quantize,
    dequantize_unrotate,
)
from metal_flash_attention_plus_tpu.ops.gemm import (  # noqa: F401
    GEMMDescriptor,
    matmul,
)
