"""exp45 (round 5): split-nibble int4 page layout through the REAL
decode kernel.

exp41 measured the "split" high-nibble encoding (signed value << 4,
unpacked by one arithmetic >> 4) at 1.14x vs the int32-widened
offset-offset unpack in a decode-shaped microbench.  This run drives the
PRODUCTION paged decode kernel (32K context, disjoint pages, b-slope
4/16) with the now-landed split layout against the int8 halves pool —
the number the engine actually sees.

Prints per-arm marginal decode time and the int4:int8 and int4:bf16
ratios, within-run.
"""
import sys

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache()

import bench  # noqa: E402  (repo-root harness: reuses the graded arm)


def main():
    bench._calibrate_measurement()
    out = bench.run_bandwidth_arm()
    print(out, flush=True)


if __name__ == "__main__":
    main()
