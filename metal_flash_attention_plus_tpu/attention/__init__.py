from metal_flash_attention_plus_tpu.attention.descriptor import (  # noqa: F401
    AttentionDescriptor,
    BroadcastMode,
    MultiHeadShape,
)
from metal_flash_attention_plus_tpu.attention.masking import (  # noqa: F401
    MaskKind,
    MaskSpec,
    build_block_sparse_ranges,
    build_sliding_window_ranges,
    materialize_mask,
)
