#!/usr/bin/env python3
"""Regenerate golden tracker outputs on MOT17-mini (tests/golden/).

Run after INTENTIONAL behavior changes; tests/test_golden.py diffs
against these to catch unintended ones. Uses the exact JV solver so
outputs are deterministic.
"""

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MOT_MINI = Path("/root/reference/assets/MOT17-mini/train")
GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"

# all 9: the CMC/ReID trackers are deterministic here too — the eval
# runs with dummy 1080p frames (ECC/SOF on constant images yield the
# identity warp) and no embedding files ship with MOT17-mini
TRACKERS = ["sort", "bytetrack", "ocsort", "boosttrack", "ucmctrack",
            "deepocsort", "strongsort", "botsort", "hybridsort"]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from motcpp_tpu.cli import main as cli_main

    if not MOT_MINI.exists():
        print("MOT17-mini assets unavailable")
        return 1
    for trk in TRACKERS:
        out = GOLDEN / trk
        if out.exists():
            shutil.rmtree(out)
        cli_main([str(MOT_MINI), str(out), trk,
                  "--max-dets", "128", "--max-tracks", "128", "--cpu"])
        print(f"regenerated {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
