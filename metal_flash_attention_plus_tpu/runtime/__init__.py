"""Native runtime bindings (C++ scheduler / allocator / resolver)."""

from metal_flash_attention_plus_tpu.runtime.native import (  # noqa: F401
    BlockConfig,
    CalibCache,
    PagePool,
    Scheduler,
    ScheduledItem,
    device_vmem_budget,
    native_available,
    resolve_blocks,
)
