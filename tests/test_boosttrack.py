"""BoostTrack tests: confidence boosting, fused cost, output filters."""

import numpy as np
import pytest

from motcpp_tpu.models.boosttrack import BoostTrack

IMG = np.zeros((1080, 1920, 3), np.uint8)


def small(**kw):
    kw.setdefault("max_tracks", 32)
    kw.setdefault("max_dets", 16)
    return BoostTrack(**kw)


def det(x1, y1, x2, y2, conf=0.9, cls=0):
    return [x1, y1, x2, y2, conf, cls]


def test_first_frame_emits():
    tr = small()
    out = tr.update(np.array([det(100, 100, 180, 300)], np.float32), IMG)
    assert out.shape == (1, 8)
    assert int(out[0, 4]) == 1


def test_identity_tracking():
    tr = small()
    tid = None
    for t in range(6):
        d = np.array([det(100 + 6 * t, 100, 180 + 6 * t, 300)], np.float32)
        out = tr.update(d, IMG)
        assert out.shape[0] == 1
        if tid is None:
            tid = int(out[0, 4])
        assert int(out[0, 4]) == tid


def test_dlo_boost_rescues_low_conf():
    """A low-conf det overlapping an existing track gets its confidence
    boosted above det_thresh (plain DLO path)."""
    tr = small(det_thresh=0.6, use_dlo_boost=True, use_sb=False, use_vt=False,
               dlo_boost_coef=0.9)
    d = np.array([det(100, 100, 180, 300, 0.9)], np.float32)
    tr.update(d, IMG)
    # same spot, conf 0.3 < det_thresh, but IoU ~1 -> boost 0.9 >= 0.6
    low = np.array([det(101, 101, 181, 301, 0.3)], np.float32)
    out = tr.update(low, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 4]) == 1


def test_no_boost_without_tracks():
    tr = small(det_thresh=0.6, use_dlo_boost=True, use_sb=False, use_vt=False)
    low = np.array([det(100, 100, 180, 300, 0.3)], np.float32)
    out = tr.update(low, IMG)
    assert out.shape[0] == 0  # nothing to boost against


def test_vt_boost_lifts_to_threshold():
    tr = small(det_thresh=0.6, use_dlo_boost=True, use_sb=True, use_vt=True)
    d = np.array([det(100, 100, 180, 300, 0.9)], np.float32)
    tr.update(d, IMG)
    near = np.array([det(100, 100, 180, 300, 0.2)], np.float32)  # IoU ~1 > 0.95
    out = tr.update(near, IMG)
    assert out.shape[0] == 1


def test_aspect_ratio_filter():
    """Wide boxes (w/h > aspect_ratio_thresh) are filtered from output."""
    tr = small(aspect_ratio_thresh=1.6)
    wide = np.array([det(100, 100, 500, 200, 0.9)], np.float32)  # 400x100
    out = tr.update(wide, IMG)
    assert out.shape[0] == 0  # tracked internally but filtered from output
    assert bool(np.asarray(tr._state.active).any())


def test_min_box_area_filter():
    tr = small(min_box_area=500)
    tiny = np.array([det(100, 100, 110, 120, 0.9)], np.float32)  # area 200
    out = tr.update(tiny, IMG)
    assert out.shape[0] == 0


def test_embedding_fusion():
    tr = small(with_reid=True)
    ea = np.array([[1.0, 0.0, 0.0]], np.float32)
    eb = np.array([[0.0, 1.0, 0.0]], np.float32)
    ids = {0: set(), 1: set()}
    for t in range(8):
        xa, xb = 100 + 12 * t, 220 - 12 * t
        dets = np.array(
            [det(xa, 100, xa + 60, 300), det(xb, 102, xb + 60, 302, 0.85)],
            np.float32,
        )
        out = tr.update(dets, IMG, embs=np.vstack([ea, eb]))
        for r in out:
            ids[int(r[7])].add(int(r[4]))
    assert len(ids[0]) == 1 and len(ids[1]) == 1 and ids[0] != ids[1]


def test_death_after_max_age():
    tr = small(max_age=2)
    d = np.array([det(100, 100, 180, 300)], np.float32)
    tr.update(d, IMG)
    empty = np.zeros((0, 6), np.float32)
    for _ in range(4):
        tr.update(empty, IMG)
    assert not bool(np.asarray(tr._state.active).any())
