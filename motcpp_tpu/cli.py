"""Evaluation CLI — the TPU equivalent of the reference's eval tool.

Usage (mirrors reference: tools/motcpp_eval.cpp:19-38):

    python -m motcpp_tpu.cli <mot_root> <output_dir> [tracker]
                             [det_emb_root] [model] [reid] [reid_weights]

Per sequence: load detections (+optional pre-generated embeddings), run
the tracker frame by frame, append MOT-Challenge rows. Replicates the
reference's ablation-split handling (tools/motcpp_eval.cpp:336-375):
when detection frames extend past 1.5x the GT range, only frames after
``max_det - max_gt`` are processed and output frame ids are shifted
down by that offset. Missing images fall back to a 1080p dummy frame
(tools/motcpp_eval.cpp:380-447).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


REID_TRACKERS = ("deepocsort", "strongsort", "botsort", "boosttrack",
                 "hybridsort")


def build_tracker(name: str, fps: int = 30, reid_weights: str = "",
                  **overrides):
    """Construct a tracker with the eval tool's hardcoded defaults
    (reference: tools/motcpp_eval.cpp:96-316). Capacity knobs and the
    assignment kernel can be overridden; reid_weights (the reference's
    7th CLI argument, motcpp_eval.cpp:38,168-282) enables live on-device
    ReID for the appearance trackers when no pre-generated embeddings
    are supplied."""
    import motcpp_tpu

    name = name.lower()
    defaults: dict = {}
    if name == "bytetrack":
        defaults = dict(frame_rate=fps)
    elif name in ("ucmc", "ucmctrack"):
        # dt = 1 / sequence fps (reference: motcpp_eval.cpp:129)
        defaults = dict(dt=1.0 / fps)
    if reid_weights and name in REID_TRACKERS:
        defaults["reid_weights"] = reid_weights
        if name in ("botsort", "hybridsort"):
            defaults["with_reid"] = True
    defaults.update(overrides)
    return motcpp_tpu.create_tracker(name, **defaults)


def run_sequence(
    tracker,
    seq_info,
    detections: dict,
    embeddings: dict,
    output_file: Path,
    dataset,
    use_images: bool = False,
    no_ablation: bool = False,
    limit_frames: int = 0,
):
    """Track one sequence, appending MOT rows; returns frames processed.

    no_ablation: skip the reference's ablation-split offset and process
    every detection frame from frame 1 (for long-horizon regression —
    the ablation window is only as long as the GT span).
    limit_frames: if > 0, stop after this many frames.
    """
    from motcpp_tpu.data import convert_to_mot_format, write_mot_results
    from motcpp_tpu.data.mot17 import read_gt_max_frame

    if output_file.exists():
        output_file.unlink()

    frames = sorted(detections)
    frame_offset = 0
    if frames and not no_ablation:
        max_gt = read_gt_max_frame(seq_info.gt_path)
        max_det = frames[-1]
        if max_gt > 0 and max_det > max_gt * 1.5:
            frame_offset = max_det - max_gt
            frames = [f for f in frames if f > frame_offset]
            print(
                f"  Detected ablation offset: {frame_offset} "
                f"(processing {len(frames)} frames)"
            )
    if limit_frames > 0:
        frames = frames[:limit_frames]

    dummy = np.zeros((1080, 1920, 3), np.uint8)
    processed = 0
    for frame_id in frames:
        dets = detections.get(frame_id, np.zeros((0, 6), np.float32))
        embs = embeddings.get(frame_id)
        if embs is not None and embs.shape[0] != dets.shape[0]:
            embs = None
        img = dummy
        if use_images and frame_id in seq_info.frame_ids:
            idx = seq_info.frame_ids.index(frame_id)
            from motcpp_tpu.data.mot17 import _imread

            loaded = _imread(seq_info.frame_paths[idx])
            if loaded is not None:
                img = loaded
        tracks = tracker.update(dets, img, embs)
        out_frame = frame_id - frame_offset if frame_offset > 0 else frame_id
        if tracks.shape[0] > 0:
            write_mot_results(
                output_file, convert_to_mot_format(tracks, out_frame)
            )
        processed += 1
    return processed


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="motcpp_tpu.cli",
        description="Run a tracker over MOT sequences and write "
        "MOT-Challenge result files.",
    )
    ap.add_argument("mot_root")
    ap.add_argument("output_dir")
    ap.add_argument("tracker", nargs="?", default="bytetrack")
    ap.add_argument("det_emb_root", nargs="?", default="")
    ap.add_argument("model", nargs="?", default="")
    ap.add_argument("reid", nargs="?", default="")
    ap.add_argument(
        "reid_weights", nargs="?", default="",
        help="ReID checkpoint (.pt/.pth/.npz) for live on-device "
        "embeddings — the reference eval's 7th argument "
        "(tools/motcpp_eval.cpp:38); pre-generated embedding files "
        "still take precedence when present",
    )
    ap.add_argument("--max-dets", type=int, default=128)
    ap.add_argument("--max-tracks", type=int, default=256)
    ap.add_argument("--lap", default="jv",
                    choices=["jv", "auction", "auction_pallas"])
    ap.add_argument(
        "--images", action="store_true",
        help="load real frames (default: dummy 1080p images, like the "
        "reference eval when frames are missing)",
    )
    ap.add_argument(
        "--no-ablation", action="store_true",
        help="process every detection frame from frame 1 instead of the "
        "reference's ablation window (long-horizon regression runs)",
    )
    ap.add_argument(
        "--limit-frames", type=int, default=0,
        help="stop each sequence after N frames (0 = all)",
    )
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from motcpp_tpu.data import MOT17Dataset

    dataset = MOT17Dataset(args.mot_root, args.det_emb_root, args.model, args.reid)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for seq in dataset.sequences:
        print(f"Processing {seq.name} ({seq.fps} fps)")
        t0 = time.time()
        detections = dataset.load_detections(seq.det_path)
        emb_path = dataset.emb_path_for(seq.name)
        embeddings = dataset.load_embeddings(emb_path, detections)
        tracker = build_tracker(
            args.tracker,
            fps=seq.fps,
            reid_weights=args.reid_weights,
            max_dets=args.max_dets,
            max_tracks=args.max_tracks,
            lap_impl=args.lap,
        )
        n = run_sequence(
            tracker,
            seq,
            detections,
            embeddings,
            out_dir / f"{seq.name}.txt",
            dataset,
            use_images=args.images,
            no_ablation=args.no_ablation,
            limit_frames=args.limit_frames,
        )
        print(f"  {n} frames in {time.time()-t0:.1f}s -> {out_dir / (seq.name + '.txt')}")

    print("Evaluation completed!")
    print(f"Results saved to: {out_dir}")
    print(
        "To compute metrics: python scripts/eval_mot.py "
        f"--gt_folder {args.mot_root} --trackers_folder {out_dir}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
