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
from metal_flash_attention_plus_tpu.quant.capabilities import (  # noqa: F401
    DeviceCapabilities,
    capability_report,
    probe_capabilities,
    resolve_strategy,
)
from metal_flash_attention_plus_tpu.quant.serialization import (  # noqa: F401
    load_quantized,
    save_quantized,
)
from metal_flash_attention_plus_tpu.quant.ste import (  # noqa: F401
    fake_quantize,
)
