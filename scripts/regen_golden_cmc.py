#!/usr/bin/env python3
"""Regenerate CMC-active + embedding-active goldens (tests/golden_cmc).

The MOT17-mini goldens run dummy frames (identity warps) and no
embeddings, so the warp-application and gallery/EMA paths of the five
CMC/ReID trackers were previously pinned only in their degenerate
configuration (VERDICT r1 #4). Here a deterministic synthetic
moving-camera scene (motcpp_tpu.data.synthetic.camera_pan_scene) drives
LIVE CMC estimation (ECC / SOF / SOFJax) and real per-identity
embeddings with dropout gaps, and the outputs are byte-pinned.

Reference behavior being matched: botsort.cpp:60-91 (multi_gmc),
strongsort.cpp:111-132 (camera_update), deepocsort.cpp:636-648 (SOF
affine on all track KFs), boosttrack.cpp:493 / hybridsort ECC
camera_update; embedding fusion per tracker (gallery min-cosine,
EMA + adaptive weighting, min(iou, emb/2) masking, Mh+emb, TCM+EG).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden_cmc"

# (golden name, tracker, extra ctor kwargs, needs_cv2)
RUNS = [
    ("botsort_ecc", "botsort", dict(cmc_method="ecc"), True),
    ("botsort_sofjax", "botsort", dict(cmc_method="sof_jax"), False),
    ("strongsort_ecc", "strongsort", {}, True),
    ("deepocsort_sof", "deepocsort", {}, True),
    ("boosttrack_ecc", "boosttrack", {}, True),
    ("hybridsort_ecc", "hybridsort", {}, True),
]

# re-match gaps: object 2 drops frames 10-14, object 4 drops 8-9
DROPOUTS = {2: set(range(10, 15)), 4: {8, 9}}


def run_scene(tracker_name: str, ctor_kwargs: dict) -> str:
    """Run one tracker over the pan scene; returns MOT text."""
    import numpy as np

    import motcpp_tpu
    from motcpp_tpu.data import convert_to_mot_format
    from motcpp_tpu.data.synthetic import camera_pan_scene

    try:
        import cv2

        cv2.setRNGSeed(0)  # SOF's RANSAC must be deterministic
    except ImportError:
        pass

    frames, dets_all, embs_all = camera_pan_scene(
        n_frames=30, dropout_frames=DROPOUTS
    )
    tracker = motcpp_tpu.create_tracker(
        tracker_name, max_dets=16, max_tracks=32, **ctor_kwargs
    )
    lines = []
    for t, (img, dets, embs) in enumerate(zip(frames, dets_all, embs_all)):
        tracks = tracker.update(dets, img, embs)
        for row in convert_to_mot_format(np.asarray(tracks), t + 1):
            lines.append(
                ",".join(
                    [f"{int(v)}" for v in row[:6]]
                    + [f"{row[6]:.6f}", "-1", "-1", "-1"]
                )
            )
    return "\n".join(lines) + "\n"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    GOLDEN.mkdir(parents=True, exist_ok=True)
    only = sys.argv[1:]
    for name, tracker, kwargs, _needs_cv2 in RUNS:
        if only and name not in only:
            continue
        text = run_scene(tracker, kwargs)
        n_ids = len({line.split(",")[1] for line in text.strip().splitlines()})
        (GOLDEN / f"{name}.txt").write_text(text)
        print(f"regenerated {name}: {len(text.splitlines())} rows, {n_ids} ids")
    return 0


if __name__ == "__main__":
    sys.exit(main())
