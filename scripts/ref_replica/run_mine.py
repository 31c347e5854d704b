#!/usr/bin/env python3
"""Run THIS repo's trackers on the replica-comparison scene.

Same 600-frame no-pan scene and eval-tool-parity configs as the
reference replica binary (see README.md here); emits one JSON line per
tracker so the docs/accuracy.md table can be regenerated from actual
measurements on both sides.

Usage: python scripts/ref_replica/run_mine.py [--frames 600] [--trackers a b]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--trackers", nargs="*", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from scripts.ablation_benchmark import SCOREBOARD, run_scoreboard

    # extra comparison rows beyond the committed scoreboard
    SCOREBOARD.setdefault(
        "strongsort-hppdef",
        dict(kw={}, embs=True, model="strongsort"),
    )
    results = run_scoreboard(
        n_frames=args.frames,
        trackers=args.trackers,
        pan_amp=(0.0, 0.0),
        use_warps=False,
    )
    for name, m in results.items():
        print(json.dumps({"tracker": name, **m}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
