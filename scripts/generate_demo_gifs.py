#!/usr/bin/env python3
"""Render tracker demo GIFs over a MOT dataset.

Equivalent of the reference's demo scripts (reference:
scripts/generate_demo_gif{,s}.py render colored boxes/trajectories over
MOT17-mini for the README). Runs any tracker over each sequence's real
frames and writes one animated GIF per sequence.

Usage:
    python scripts/generate_demo_gifs.py <mot_root> <out_dir> [tracker]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    mot_root, out_dir = argv[0], Path(argv[1])
    tracker_name = argv[2] if len(argv) > 2 else "bytetrack"
    out_dir.mkdir(parents=True, exist_ok=True)

    import motcpp_tpu
    from motcpp_tpu.data import MOT17Dataset
    from motcpp_tpu.data.mot17 import _imread
    from motcpp_tpu.utils.visualization import plot_results, save_gif

    ds = MOT17Dataset(mot_root)
    for seq in ds.sequences:
        dets_map = ds.load_detections(seq.det_path)
        tracker = motcpp_tpu.create_tracker(tracker_name)
        frames = []
        history: dict = {}
        for frame_id, img_path in zip(seq.frame_ids, seq.frame_paths):
            img = _imread(img_path)
            if img is None:
                continue
            import numpy as np

            dets = dets_map.get(frame_id, np.zeros((0, 6), np.float32))
            tracks = tracker.update(dets, img)
            frames.append(
                plot_results(img, tracks, show_trajectories=True,
                             history=history)
            )
        if frames:
            gif = out_dir / f"{seq.name}_{tracker_name}.gif"
            save_gif(frames, gif, fps=10)
            print(f"wrote {gif} ({len(frames)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
