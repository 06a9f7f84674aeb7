"""Native runtime bindings (C++ scheduler / allocator / resolver)."""

from metal_flash_attention_plus_tpu.runtime.native import (  # noqa: F401
    BlockConfig,
    CalibCache,
    PagePool,
    Scheduler,
    ScheduledItem,
    native_available,
    resolve_blocks,
)
