from metal_flash_attention_plus_tpu.reference.attention import (  # noqa: F401
    reference_attention,
    reference_attention_bwd,
    reference_mha,
)
