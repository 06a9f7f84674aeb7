"""Serving layer: paged KV cache, ragged decode attention, and the
continuous-batching engine driven by the native (C++) scheduler."""

from metal_flash_attention_plus_tpu.serving.paged_attention import (  # noqa: F401
    paged_decode_attention,
    paged_prefill_attention,
)
from metal_flash_attention_plus_tpu.serving.kv_cache import (  # noqa: F401
    PagedKVCache,
)
from metal_flash_attention_plus_tpu.serving.engine import (  # noqa: F401
    GenerationRequest,
    ServingEngine,
)
