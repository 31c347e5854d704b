#!/usr/bin/env python3
"""Recompute tests/accuracy_mot17mini.json from the long-horizon goldens.

Run AFTER scripts/regen_golden.py whenever tracker behavior changes
intentionally; tests/test_accuracy_real.py pins trackers to this table.
Prints a markdown table to paste into docs/benchmarking.md.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
MOT_MINI = ROOT / "assets" / "MOT17-mini" / "train"
GOLDEN_LONG = ROOT / "tests" / "golden_long"
TABLE = ROOT / "tests" / "accuracy_mot17mini.json"


def main():
    from motcpp_tpu.metrics import combine_metrics, evaluate_sequence

    table = {}
    for trk_dir in sorted(GOLDEN_LONG.iterdir()):
        if not trk_dir.is_dir():
            continue
        rows = []
        for res in sorted(trk_dir.glob("*.txt")):
            gt = MOT_MINI / res.stem / "gt" / "gt.txt"
            rows.append(evaluate_sequence(gt, res))
        comb = combine_metrics(rows)
        table[trk_dir.name] = {
            **{k: round(comb[k], 2)
               for k in ("HOTA", "MOTA", "IDF1", "DetA", "AssA", "MOTP")},
            **{k: comb[k] for k in ("IDSW", "FP", "FN", "MT", "ML")},
        }
    TABLE.write_text(json.dumps(table, indent=1) + "\n")
    print(f"wrote {TABLE}\n")
    cols = ["HOTA", "MOTA", "IDF1", "DetA", "AssA", "IDSW", "FP", "FN", "MT", "ML"]
    print("| tracker | " + " | ".join(cols) + " |")
    print("|---" * (len(cols) + 1) + "|")
    for trk in sorted(table, key=lambda t: -table[t]["HOTA"]):
        m = table[trk]
        cells = [f"{m[c]:.2f}" if isinstance(m[c], float) else str(m[c])
                 for c in cols]
        print(f"| {trk} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
