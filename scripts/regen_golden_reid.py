#!/usr/bin/env python3
"""Regenerate the converted-checkpoint ReID goldens (tests/golden_reid).

Pins the FULL pretrained-ReID chain (VERDICT r2 #5): a torchreid-layout
checkpoint (scripts/torch_osnet.py) -> name-based conversion
(scripts/convert_reid_weights.py, committed as
tests/fixtures/osnet_x0_25_converted.npz) -> ReIDBackend inference from
REAL MOT17-mini pixels -> StrongSORT / BoT-SORT association. The
reference's equivalent chain is export_reid_onnx.py -> ONNXBackend ->
tracker (reference: scripts/export_reid_onnx.py:15-50,
src/appearance/onnx_backend.cpp:110-223).

Regenerate the fixture itself (only if the conversion layout changes):
    python scripts/torch_osnet.py /tmp/osnet.pt x0_25
    python scripts/convert_reid_weights.py /tmp/osnet.pt \
        tests/fixtures/osnet_x0_25_converted.npz x0_25

Usage: python scripts/regen_golden_reid.py
"""

import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

FIXTURE = ROOT / "tests" / "fixtures" / "osnet_x0_25_converted.npz"
GOLDEN = ROOT / "tests" / "golden_reid"
SEQ = ROOT / "assets" / "MOT17-mini" / "train" / "MOT17-02-FRCNN"
N_FRAMES = 4  # the bundled jpg frames


def load_frames_and_dets():
    """(frames, dets_by_frame) for the bundled MOT17-02 jpgs."""
    import cv2

    dets_by_frame = {}
    for ln in (SEQ / "det" / "det.txt").read_text().splitlines():
        f = [float(x) for x in ln.split(",")[:7]]
        t = int(f[0])
        if t > N_FRAMES:
            continue
        x, y, w, h, conf = f[2], f[3], f[4], f[5], f[6]
        dets_by_frame.setdefault(t, []).append([x, y, x + w, y + h, conf, 0])
    frames = {
        t: cv2.imread(str(SEQ / "img1" / f"{t:06d}.jpg"))
        for t in range(1, N_FRAMES + 1)
    }
    return frames, {
        t: np.asarray(v, np.float32) for t, v in dets_by_frame.items()
    }


def run_tracker(name, backend):
    import motcpp_tpu

    frames, dets_by_frame = load_frames_and_dets()
    tr = motcpp_tpu.create_tracker(name, max_tracks=64, max_dets=32)
    rows = []
    for t in range(1, N_FRAMES + 1):
        dets = dets_by_frame.get(t, np.zeros((0, 6), np.float32))
        img = frames[t]
        # live chain: features from PIXELS through the converted weights
        embs = backend.get_features(dets[:, :4], img)
        out = tr.update(dets, img, embs)
        for r in out:
            rows.append([t] + [round(float(v), 2) for v in r])
    return rows


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from motcpp_tpu.appearance.reid import ReIDBackend

    backend = ReIDBackend(weights=str(FIXTURE))
    GOLDEN.mkdir(exist_ok=True)

    # forward pin: deterministic synthetic crops -> feature fingerprint
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 320, 3)).astype(np.uint8)
    boxes = np.asarray(
        [[10, 10, 120, 240], [150, 20, 300, 250], [0, 0, 320, 256]],
        np.float32,
    )
    feats = backend.get_features(boxes, img)
    fingerprint = {
        "feature_dim": int(feats.shape[1]),
        "norms": [round(float(x), 4) for x in np.linalg.norm(feats, axis=1)],
        "pairwise_cos": [
            round(float(feats[i] @ feats[j]), 4)
            for i in range(3) for j in range(i + 1, 3)
        ],
        "first8": [round(float(x), 4) for x in feats[0, :8]],
    }
    (GOLDEN / "forward_fingerprint.json").write_text(
        json.dumps(fingerprint, indent=1) + "\n"
    )

    for name in ("strongsort", "botsort"):
        rows = run_tracker(name, backend)
        (GOLDEN / f"{name}_MOT17-02.json").write_text(
            json.dumps(rows) + "\n"
        )
        print(f"{name}: {len(rows)} golden rows")
    print(f"wrote {GOLDEN}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
