#!/usr/bin/env python3
"""Compute HOTA / CLEAR / Identity metrics for MOT result folders.

In-repo equivalent of the reference's TrackEval wrapper (reference:
scripts/eval_mot.py downloads TrackEval from GitHub and patches it; this
environment has no egress, so the metrics are implemented natively in
motcpp_tpu.metrics and produce the same metric families the reference's
benchmark tables report: HOTA, MOTA, IDF1 and friends).

Usage:
    python scripts/eval_mot.py --gt_folder <mot_root> \
        --trackers_folder <results_dir> [--classes 1]

The tracker folder holds one <sequence>.txt per sequence; GT is read
from <mot_root>/<sequence>/gt/gt.txt. When result frames were written
with an ablation offset (reference: tools/motcpp_eval.cpp:336-375), they
already align with GT frame numbering.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from motcpp_tpu.metrics import combine_metrics, evaluate_sequence  # noqa: E402


def _display(m: dict) -> dict:
    """Drop pooling accumulators (non-JSON-serializable arrays)."""
    return {k: v for k, v in m.items() if not k.startswith("_")}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt_folder", required=True)
    ap.add_argument("--trackers_folder", required=True)
    ap.add_argument("--classes", type=int, nargs="*", default=[1])
    ap.add_argument("--json", action="store_true", help="machine output")
    args = ap.parse_args(argv)

    gt_root = Path(args.gt_folder)
    res_root = Path(args.trackers_folder)
    rows = []
    for res_file in sorted(res_root.glob("*.txt")):
        seq = res_file.stem
        gt_file = gt_root / seq / "gt" / "gt.txt"
        if not gt_file.exists():
            print(f"# no GT for {seq}, skipping", file=sys.stderr)
            continue
        m = evaluate_sequence(gt_file, res_file, tuple(args.classes))
        m["seq"] = seq
        rows.append(m)

    if not rows:
        print("No sequences evaluated", file=sys.stderr)
        return 1

    if args.json:
        combined = _display(combine_metrics(rows))
        combined["seq"] = "COMBINED"
        print(json.dumps([_display(m) for m in rows] + [combined]))
        return 0

    keys = ["HOTA", "MOTA", "IDF1", "DetA", "AssA", "MOTP", "IDSW", "FP", "FN", "MT", "ML"]
    hdr = f"{'seq':22s}" + "".join(f"{k:>8s}" for k in keys)
    print(hdr)
    print("-" * len(hdr))
    for m in rows:
        print(
            f"{m['seq']:22s}"
            + "".join(
                f"{m[k]:8.2f}" if isinstance(m[k], float) else f"{m[k]:8d}"
                for k in keys
            )
        )
    # combined: pooled accumulators (TrackEval semantics), not an
    # average of per-sequence ratios
    print("-" * len(hdr))
    comb = combine_metrics(rows)
    print(
        f"{'COMBINED':22s}"
        + "".join(
            f"{comb[k]:8.2f}" if isinstance(comb[k], float) else f"{comb[k]:8d}"
            for k in keys
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
