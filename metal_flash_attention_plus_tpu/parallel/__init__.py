"""Distributed layer — all new scope vs the reference (SURVEY.md §2.5).

The reference is single-device: its only parallelism is the threadgroup grid
(sequence blocks × heads × batch, ``MultiHeadAttention.swift:180-186``).  The
TPU build adds mesh-level parallelism as first-class components:

- :mod:`.mesh`       — named mesh axes (data / model / context) + helpers.
- :mod:`.ring`       — ring attention (context parallelism) over ``ppermute``
                       with cross-device online-softmax merging, fwd + bwd.
- :mod:`.ulysses`    — Ulysses-style all-to-all head↔sequence reshard.
- :mod:`.spmd`       — shard_map 3D-parallel (DP × TP × CP) transformer
                       forward/loss/train-step built on the Pallas kernels.
"""

from metal_flash_attention_plus_tpu.parallel.mesh import (  # noqa: F401
    MeshAxes,
    make_mesh,
)
from metal_flash_attention_plus_tpu.parallel.ring import (  # noqa: F401
    ring_attention,
    ring_attention_zigzag,
    zigzag_postshard,
    zigzag_preshard,
)
from metal_flash_attention_plus_tpu.parallel.ulysses import (  # noqa: F401
    ulysses_attention,
)
from metal_flash_attention_plus_tpu.parallel.moe import (  # noqa: F401
    init_moe_params,
    moe_ffn,
)
from metal_flash_attention_plus_tpu.parallel.pipeline import (  # noqa: F401
    broadcast_from_last_stage,
    pipeline_apply,
)
