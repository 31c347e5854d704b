#!/usr/bin/env python3
"""Minimal single-stream tracking loop — the TPU equivalent of the
reference's README quick-start (reference: README.md "Quick Start",
include/motcpp/motcpp.hpp umbrella usage).

Run: python examples/basic_tracking.py [--cpu]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tracker", default="bytetrack")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import motcpp_tpu

    tracker = motcpp_tpu.create_tracker(
        args.tracker, max_tracks=32, max_dets=16
    )
    img = np.zeros((1080, 1920, 3), np.uint8)  # frame (dims + CMC + crops)

    # two objects moving right; a third appears at frame 5
    for frame in range(1, 11):
        dets = [
            [100 + 6 * frame, 200, 180 + 6 * frame, 420, 0.92, 0],
            [600 + 4 * frame, 300, 700 + 4 * frame, 560, 0.88, 0],
        ]
        if frame >= 5:
            dets.append([1200, 400, 1300, 660, 0.75, 0])
        tracks = tracker.update(np.asarray(dets, np.float32), img)
        ids = tracks[:, 4].astype(int).tolist()
        print(f"frame {frame:2d}: {tracks.shape[0]} tracks, ids={ids}")


if __name__ == "__main__":
    main()
