from metal_flash_attention_plus_tpu.quant.params import (  # noqa: F401
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import (  # noqa: F401
    QuantizedTensor,
    dequantize,
    quantize,
    pack_int4,
    unpack_int4,
)
