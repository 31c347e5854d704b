#!/usr/bin/env python3
"""Regenerate golden tracker outputs on MOT17-mini (tests/golden*).

Run after INTENTIONAL behavior changes; tests/test_golden.py diffs
against these to catch unintended ones. Uses the exact JV solver so
outputs are deterministic.

Two golden sets:
  tests/golden/       ablation-window runs (the reference eval's offset
                      logic, tools/motcpp_eval.cpp:336-375): 4+8 frames
                      scored against the bundled GT.
  tests/golden_long/  long-horizon runs (--no-ablation, first 150 det
                      frames): spans >2x every lifecycle constant
                      (max_time_lost=30, max_age<=60), so lost-track
                      aging, max_age deaths, duplicate removal and OCR
                      long-gap re-matches are pinned on REAL detections.

Usage: python scripts/regen_golden.py [tracker ...]   (default: all 9)
"""

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MOT_MINI = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"
GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"
GOLDEN_LONG = Path(__file__).resolve().parent.parent / "tests" / "golden_long"
LONG_FRAMES = 150

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
    only = sys.argv[1:] or TRACKERS
    for trk in only:
        out = GOLDEN / trk
        if out.exists():
            shutil.rmtree(out)
        cli_main([str(MOT_MINI), str(out), trk,
                  "--max-dets", "128", "--max-tracks", "128", "--cpu"])
        print(f"regenerated {out}")

        out = GOLDEN_LONG / trk
        if out.exists():
            shutil.rmtree(out)
        cli_main([str(MOT_MINI), str(out), trk,
                  "--max-dets", "128", "--max-tracks", "128", "--cpu",
                  "--no-ablation", "--limit-frames", str(LONG_FRAMES)])
        print(f"regenerated {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
