#!/usr/bin/env python3
"""Render tracker demo GIFs: single-tracker per sequence, multi-tracker
comparison grids, and a synthetic moving-camera demo.

Equivalent of the reference's demo renderers (reference:
scripts/generate_demo_gif{,s}.py, generate_real_demos.py render colored
boxes + trajectories over MOT17-mini for the README): colored boxes with
id+confidence labels, fading trajectory trails, a header banner with
tracker name and frame counter, and a labeled side-by-side grid when
several trackers are requested.

Usage:
    python scripts/generate_demo_gifs.py <mot_root> <out_dir>
        [tracker[,tracker2,...]] [--synthetic] [--fps N] [--cpu]

With more than one tracker, one comparison-grid GIF per sequence is
written in addition to the per-tracker GIFs. --synthetic ignores
mot_root and renders the deterministic camera-pan scene
(motcpp_tpu.data.synthetic) instead — useful when a dataset ships only
a handful of frames.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _render_run(tracker_name, frame_iter, fps, out_path, cli_args):
    """frame_iter yields (frame_id, img, dets). Returns rendered frames."""
    import numpy as np

    import motcpp_tpu
    from motcpp_tpu.utils.visualization import plot_results

    tracker = motcpp_tpu.create_tracker(tracker_name)
    frames = []
    history: dict = {}
    for frame_id, img, dets in frame_iter:
        tracks = tracker.update(dets, img)
        frames.append(
            plot_results(
                np.asarray(img), tracks,
                show_trajectories=True, history=history, show_conf=True,
                header=f"{tracker_name}  frame {frame_id}",
            )
        )
    return frames


def _dataset_frames(seq, dets_map):
    import numpy as np

    from motcpp_tpu.data.mot17 import _imread

    for frame_id, img_path in zip(seq.frame_ids, seq.frame_paths):
        img = _imread(img_path)
        if img is None:
            continue
        yield frame_id, img, dets_map.get(
            frame_id, np.zeros((0, 6), np.float32)
        )


def _synthetic_frames(n_frames=40):
    from motcpp_tpu.data.synthetic import camera_pan_scene

    frames, dets_all, _ = camera_pan_scene(
        n_frames=n_frames, img_hw=(240, 320),
        dropout_frames={2: set(range(15, 20))},
    )
    for t, (img, dets) in enumerate(zip(frames, dets_all)):
        yield t + 1, img, dets


def main(argv=None):
    ap = argparse.ArgumentParser(usage=__doc__)
    ap.add_argument("mot_root")
    ap.add_argument("out_dir")
    ap.add_argument("trackers", nargs="?", default="bytetrack",
                    help="comma-separated tracker names")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--frames", type=int, default=40,
                    help="synthetic scene length")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    trackers = [t.strip() for t in args.trackers.split(",") if t.strip()]

    from motcpp_tpu.utils.visualization import make_grid, save_gif

    def render_sequence(seq_name, make_iter):
        per_tracker = {}
        for trk in trackers:
            frames = _render_run(trk, make_iter(), args.fps, out_dir, args)
            if not frames:
                continue
            per_tracker[trk] = frames
            gif = out_dir / f"{seq_name}_{trk}.gif"
            save_gif(frames, gif, fps=args.fps)
            print(f"wrote {gif} ({len(frames)} frames)")
        if len(per_tracker) > 1:
            n = min(len(f) for f in per_tracker.values())
            grid = [
                make_grid({t: per_tracker[t][i] for t in per_tracker})
                for i in range(n)
            ]
            gif = out_dir / f"{seq_name}_comparison.gif"
            save_gif(grid, gif, fps=args.fps)
            print(f"wrote {gif} (grid of {len(per_tracker)})")

    if args.synthetic:
        render_sequence(
            "synthetic_pan", lambda: _synthetic_frames(args.frames)
        )
        return 0

    from motcpp_tpu.data import MOT17Dataset

    ds = MOT17Dataset(args.mot_root)
    for seq in ds.sequences:
        dets_map = ds.load_detections(seq.det_path)
        render_sequence(seq.name, lambda: _dataset_frames(seq, dets_map))
    return 0


if __name__ == "__main__":
    sys.exit(main())
