from metal_flash_attention_plus_tpu.ops.flash_attention import (  # noqa: F401
    BlockSizes,
    flash_attention_forward,
)
