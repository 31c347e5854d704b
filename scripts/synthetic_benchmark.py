#!/usr/bin/env python3
"""Synthetic accuracy benchmark: all trackers on a generated scene.

Real MOT17-ablation detections/embeddings ship via a GitHub release the
reference downloads (scripts/auto_benchmark.sh) — unavailable in a
zero-egress environment — so this generates a harder synthetic scene
(many objects, crossings, dropouts, false positives, detector jitter)
and scores every tracker with the in-repo HOTA/CLEAR/Identity metrics.
Numbers are self-consistent across trackers, which is what matters for
relative comparisons and regression tracking.

Usage: python scripts/synthetic_benchmark.py [--frames 300] [--objects 24]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TRACKERS = {
    "sort": dict(max_age=3, min_hits=1),
    "bytetrack": dict(),
    "ocsort": dict(min_hits=1),
    "deepocsort": dict(min_hits=1, cmc_off=True),
    "strongsort": dict(),
    "botsort": dict(),
    "boosttrack": dict(with_reid=True),
    "hybridsort": dict(min_hits=1),
    "ucmctrack": dict(),
}
EMB_TRACKERS = {"deepocsort", "strongsort", "botsort", "boosttrack", "hybridsort"}


def make_scene(T, n_obj, seed=0, img_w=1920, img_h=1080, drop=0.08, fp=0.5):
    rng = np.random.default_rng(seed)
    id_embs = rng.normal(0, 1, (n_obj, 32)).astype(np.float32)
    id_embs /= np.linalg.norm(id_embs, axis=1, keepdims=True)
    cx = rng.uniform(100, img_w - 100, n_obj)
    cy = rng.uniform(100, img_h - 100, n_obj)
    # velocities chosen to create crossings
    vx = rng.uniform(-8, 8, n_obj)
    vy = rng.uniform(-5, 5, n_obj)
    w = rng.uniform(50, 110, n_obj)
    h = rng.uniform(120, 240, n_obj)

    gt, dets, embs = {}, {}, {}
    for t in range(1, T + 1):
        cxs = (cx + vx * t) % (img_w - 200) + 100
        cys = (cy + vy * t) % (img_h - 300) + 100
        boxes = np.stack([cxs - w / 2, cys - h / 2, cxs + w / 2, cys + h / 2], 1)
        gt[t] = (np.arange(1, n_obj + 1), boxes.copy(), np.ones(n_obj))
        rows, erows = [], []
        for i in range(n_obj):
            if rng.random() < drop:
                continue
            b = boxes[i] + rng.normal(0, 2.5, 4)
            conf = rng.uniform(0.6, 0.99)
            if rng.random() < 0.1:  # occasional low-conf (occluded)
                conf = rng.uniform(0.2, 0.45)
            rows.append([*b, conf, 0])
            e = id_embs[i] + rng.normal(0, 0.08, 32).astype(np.float32)
            erows.append(e / np.linalg.norm(e))
        if rng.random() < fp:
            x0 = rng.uniform(0, img_w - 80)
            y0 = rng.uniform(0, img_h - 170)
            rows.append([x0, y0, x0 + 70, y0 + 160, rng.uniform(0.5, 0.8), 0])
            e = rng.normal(0, 1, 32).astype(np.float32)
            erows.append(e / np.linalg.norm(e))
        dets[t] = np.asarray(rows, np.float32).reshape(-1, 6)
        embs[t] = np.asarray(erows, np.float32).reshape(-1, 32)
    return gt, dets, embs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--objects", type=int, default=24)
    ap.add_argument("--lap", default="jv", choices=["jv", "auction"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trackers", nargs="*", default=sorted(TRACKERS))
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import motcpp_tpu
    from motcpp_tpu.metrics import clear_metrics, hota_metrics, identity_metrics

    gt, dets, embs = make_scene(args.frames, args.objects)
    img = np.zeros((1080, 1920, 3), np.uint8)

    hdr = f"{'tracker':12s}{'HOTA':>8s}{'MOTA':>8s}{'IDF1':>8s}{'DetA':>8s}{'AssA':>8s}{'IDSW':>6s}"
    print(hdr)
    print("-" * len(hdr))
    import time

    for name in args.trackers:
        kw = dict(TRACKERS[name])
        kw.update(max_tracks=64, max_dets=48, lap_impl=args.lap)
        tr = motcpp_tpu.create_tracker(name, **kw)
        pred = {}
        t0 = time.time()
        for t in range(1, args.frames + 1):
            e = embs[t] if name in EMB_TRACKERS else None
            out = tr.update(dets[t], img, e)
            if out.shape[0]:
                pred[t] = (
                    out[:, 4].astype(int),
                    out[:, :4].astype(float),
                    out[:, 5].astype(float),
                )
        c = clear_metrics(gt, pred)
        i = identity_metrics(gt, pred)
        h = hota_metrics(gt, pred)
        print(
            f"{name:12s}{h['HOTA']:8.2f}{c['MOTA']:8.2f}{i['IDF1']:8.2f}"
            f"{h['DetA']:8.2f}{h['AssA']:8.2f}{c['IDSW']:6d}"
            f"   ({time.time()-t0:.0f}s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
