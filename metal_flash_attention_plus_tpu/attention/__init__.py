"""Descriptors, heuristics, and the L5 dispatch API."""

from metal_flash_attention_plus_tpu.attention.descriptor import (  # noqa: F401
    AttentionDescriptor,
    BroadcastMode,
    MultiHeadShape,
)
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: F401
    CAUSAL,
    FULL,
    MaskKind,
    MaskSpec,
    sliding_window,
)
from metal_flash_attention_plus_tpu.attention.multi_head import (  # noqa: F401
    MultiHeadAttention,
)
from metal_flash_attention_plus_tpu.attention.quantized import (  # noqa: F401
    QuantizedAttention,
    QuantizedAttentionConfig,
)
from metal_flash_attention_plus_tpu.attention.tuning import (  # noqa: F401
    AttentionTuner,
    CalibrationStore,
    default_block_sizes,
)
