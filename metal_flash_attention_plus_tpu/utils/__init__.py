from metal_flash_attention_plus_tpu.utils.roofline import (  # noqa: F401
    attention_flops,
    attention_ginstrs,
)
