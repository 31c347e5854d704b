"""HybridSORT tests: score-in-state KF, TCM costs, lifecycle quirks."""

import numpy as np
import pytest

from motcpp_tpu.models.hybridsort import HybridSort

IMG = np.zeros((1080, 1920, 3), np.uint8)


def small(**kw):
    kw.setdefault("max_tracks", 32)
    kw.setdefault("max_dets", 16)
    kw.setdefault("with_reid", False)
    return HybridSort(**kw)


def det(x1, y1, x2, y2, conf=0.9, cls=0):
    return [x1, y1, x2, y2, conf, cls]


def test_first_frame_emits_id_plus_one():
    tr = small()
    out = tr.update(np.array([det(100, 100, 180, 300)], np.float32), IMG)
    assert out.shape == (1, 8)
    assert int(out[0, 4]) == 2  # internal id 1, emitted +1


def test_identity_and_last_obs_output():
    tr = small()
    tr.update(np.array([det(100, 100, 180, 300)], np.float32), IMG)
    moved = np.array([det(108, 104, 188, 304)], np.float32)
    out = tr.update(moved, IMG)
    assert out.shape[0] == 1
    np.testing.assert_allclose(out[0, :4], moved[0, :4], atol=1e-4)


def test_byte_stage_with_tcm_score():
    tr = small(det_thresh=0.7, low_thresh=0.1, use_byte=True)
    hi = np.array([det(100, 100, 180, 300, 0.9)], np.float32)
    tr.update(hi, IMG)
    out = tr.update(hi, IMG)
    tid = int(out[0, 4])
    # low-conf continuation at the same spot -> BYTE keeps the track
    lo = np.array([det(102, 102, 182, 302, 0.4)], np.float32)
    out = tr.update(lo, IMG)
    assert out.shape[0] == 1 and int(out[0, 4]) == tid


def test_rematch_on_last_box():
    tr = small(max_age=10, min_hits=1)
    d = np.array([det(100, 100, 180, 300)], np.float32)
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    tid = int(out[0, 4])
    # null updates drag the KF toward zero (reference quirk); the final
    # rematch on the LAST OBSERVATION box recovers identity. Note the
    # hit_streak restarts after the miss, hence min_hits=1 here.
    tr.update(np.zeros((0, 6), np.float32), IMG)
    out = tr.update(d, IMG)
    assert out.shape[0] == 1 and int(out[0, 4]) == tid


def test_score_in_state_kalman():
    """The KF carries the confidence: kalman_score tracks det confs."""
    tr = small(track_thresh=0.5)
    d = np.array([det(100, 100, 180, 300, 0.95)], np.float32)
    for _ in range(5):
        tr.update(d, IMG)
    state = tr._state
    act = np.asarray(state.active)
    x = np.asarray(state.x)[act][0]
    assert x[3] == pytest.approx(0.95, abs=0.15)  # score dim converged


def test_reid_weighted_first_stage():
    tr = small(with_reid=True, EG_weight_high_score=4.6)
    ea = np.array([[1.0, 0.0]], np.float32)
    eb = np.array([[0.0, 1.0]], np.float32)
    ids = {0: set(), 1: set()}
    for t in range(8):
        xa, xb = 100 + 12 * t, 220 - 12 * t
        dets = np.array(
            [det(xa, 100, xa + 60, 300, 0.9), det(xb, 102, xb + 60, 302, 0.85)],
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


def test_empty_input_no_null_update():
    """Empty raw input must not drag tracks toward zero (the reference
    skips null updates on that path)."""
    tr = small(max_age=10)
    d = np.array([det(500, 400, 620, 700)], np.float32)
    tr.update(d, IMG)
    x_before = np.asarray(tr._state.x).copy()
    tr.update(np.zeros((0, 6), np.float32), IMG)
    x_after = np.asarray(tr._state.x)
    act = np.asarray(tr._state.active)
    # position changed only by prediction (velocity ~0), not dragged to 0
    assert abs(x_after[act][0, 0] - x_before[act][0, 0]) < 50
