"""End-to-end accuracy sanity: every tracker must achieve strong
HOTA/MOTA/IDF1 on an easy synthetic scene.

This is the integration net that catches association/lifecycle bugs the
per-tracker behavior tests might miss: generate GT tracks with linear
motion, derive noisy detections (jitter + dropouts + false positives),
run the full tracker through the public update() API, and score with
the in-repo metrics.
"""

import numpy as np
import pytest

import motcpp_tpu
from motcpp_tpu.metrics import clear_metrics, hota_metrics, identity_metrics

IMG = np.zeros((1080, 1920, 3), np.uint8)
T = 40
N_OBJ = 8


def _make_scene(seed=0, with_embs=False):
    """GT dict + per-frame detections (+ optional per-identity embs)."""
    rng = np.random.default_rng(seed)
    id_embs = rng.normal(0, 1, (N_OBJ, 16)).astype(np.float32)
    id_embs /= np.linalg.norm(id_embs, axis=1, keepdims=True)
    cx = rng.uniform(200, 1700, N_OBJ)
    cy = rng.uniform(200, 900, N_OBJ)
    vx = rng.uniform(-6, 6, N_OBJ)
    vy = rng.uniform(-4, 4, N_OBJ)
    w = rng.uniform(60, 100, N_OBJ)
    h = rng.uniform(140, 220, N_OBJ)

    gt = {}
    dets_by_frame = {}
    embs_by_frame = {}
    for t in range(1, T + 1):
        cxs = cx + vx * t
        cys = cy + vy * t
        boxes = np.stack(
            [cxs - w / 2, cys - h / 2, cxs + w / 2, cys + h / 2], axis=1
        )
        ids = np.arange(1, N_OBJ + 1)
        gt[t] = (ids, boxes.copy(), np.ones(N_OBJ))

        # noisy detections: jitter, 5% dropout, occasional FP
        keep = rng.random(N_OBJ) > 0.05
        jitter = rng.normal(0, 2.0, (N_OBJ, 4))
        det_rows = []
        emb_rows = []
        for i in range(N_OBJ):
            if keep[i]:
                b = boxes[i] + jitter[i]
                det_rows.append([*b, rng.uniform(0.75, 0.99), 0])
                e = id_embs[i] + rng.normal(0, 0.05, 16).astype(np.float32)
                emb_rows.append(e / np.linalg.norm(e))
        if rng.random() < 0.2:  # false positive
            x0, y0 = rng.uniform(0, 1800), rng.uniform(0, 950)
            det_rows.append([x0, y0, x0 + 70, y0 + 150, rng.uniform(0.5, 0.7), 0])
            e = rng.normal(0, 1, 16).astype(np.float32)
            emb_rows.append(e / np.linalg.norm(e))
        dets_by_frame[t] = np.asarray(det_rows, np.float32).reshape(-1, 6)
        embs_by_frame[t] = np.asarray(emb_rows, np.float32).reshape(-1, 16)
    if with_embs:
        return gt, dets_by_frame, embs_by_frame
    return gt, dets_by_frame


def _run(tracker_name, use_embs=False, **kw):
    gt, dets_by_frame, embs_by_frame = _make_scene(with_embs=True)
    kw.setdefault("max_tracks", 32)
    kw.setdefault("max_dets", 16)
    tr = motcpp_tpu.create_tracker(tracker_name, **kw)
    pred = {}
    for t in range(1, T + 1):
        embs = embs_by_frame[t] if use_embs else None
        out = tr.update(dets_by_frame[t], IMG, embs)
        if out.shape[0]:
            pred[t] = (
                out[:, 4].astype(int),
                out[:, :4].astype(float),
                out[:, 5].astype(float),
            )
    return gt, pred


TRACKER_PARAMS = {
    "sort": dict(max_age=3, min_hits=1),
    "bytetrack": dict(),
    "ocsort": dict(min_hits=1),
    "deepocsort": dict(min_hits=1, embedding_off=True, cmc_off=True),
    "strongsort": dict(n_init=1, use_embs=True),
    "botsort": dict(with_reid=False),
    "boosttrack": dict(),
    "hybridsort": dict(with_reid=False, min_hits=1),
    "ucmctrack": dict(),
}


@pytest.mark.parametrize("name", sorted(TRACKER_PARAMS))
def test_tracker_accuracy_on_easy_scene(name):
    params = dict(TRACKER_PARAMS[name])
    use_embs = params.pop("use_embs", False)
    gt, pred = _run(name, use_embs=use_embs, **params)
    c = clear_metrics(gt, pred)
    i = identity_metrics(gt, pred)
    h = hota_metrics(gt, pred)
    # easy scene: all trackers should be strong
    assert c["MOTA"] > 75, (name, c)
    assert i["IDF1"] > 80, (name, i)
    assert h["HOTA"] > 65, (name, h)
    # identities must be stable: at most a couple of switches
    assert c["IDSW"] <= 3, (name, c)


def test_auction_accuracy_parity_with_jv():
    """Auction vs exact JV must be metric-equivalent end-to-end."""
    gt, _ = _make_scene()[:2]
    results = {}
    for impl in ("jv", "auction"):
        _, pred = _run("bytetrack", lap_impl=impl)
        results[impl] = hota_metrics(gt, pred)["HOTA"]
    assert results["auction"] == pytest.approx(results["jv"], abs=1.0)
