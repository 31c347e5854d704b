"""OC-SORT tests (model: reference tests/test_trackers.cpp OCSort cases
plus the observation-centric behaviors in src/trackers/ocsort.cpp)."""

import numpy as np
import pytest

from motcpp_tpu.models.ocsort import OCSort

IMG = np.zeros((1080, 1920, 3), np.uint8)


def small(**kw):
    kw.setdefault("max_tracks", 32)
    kw.setdefault("max_dets", 16)
    return OCSort(**kw)


def det(x1, y1, x2, y2, conf=0.9, cls=0):
    return [x1, y1, x2, y2, conf, cls]


def test_initialization():
    OCSort()


def test_first_frame_emits_nothing():
    """ocsort.cpp:366-383 early-returns empty when no tracks pre-exist."""
    tr = small(min_hits=1)
    out = tr.update(np.array([det(100, 100, 200, 200)], np.float32), IMG)
    assert out.shape == (0, 8)


def test_second_frame_emits_with_id_plus_one():
    tr = small(min_hits=1)
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    assert out.shape == (1, 8)
    # ids start at 1 internally and outputs add +1 (ocsort.cpp:576)
    assert int(out[0, 4]) == 2


def test_output_is_last_observation_not_kf_state():
    """ocsort.cpp:565-571: output box equals the raw detection box."""
    tr = small(min_hits=1)
    tr.update(np.array([det(100, 100, 200, 200)], np.float32), IMG)
    moved = np.array([det(117, 113, 217, 213)], np.float32)
    out = tr.update(moved, IMG)
    np.testing.assert_allclose(out[0, :4], moved[0, :4], atol=1e-4)


def test_identity_persistence_and_min_hits():
    tr = small(min_hits=3)
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG)  # frame 1: no output (no tracks existed)
    out2 = tr.update(d, IMG)  # frame 2 <= min_hits: emitted
    assert out2.shape[0] == 1
    out3 = tr.update(d, IMG)
    out4 = tr.update(d, IMG)  # hit_streak now >= 3
    assert out4.shape[0] == 1
    assert int(out4[0, 4]) == int(out2[0, 4])


def test_track_dies_after_max_age():
    tr = small(min_hits=1, max_age=2)
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG)
    tr.update(d, IMG)
    empty = np.zeros((0, 6), np.float32)
    for _ in range(3):
        out = tr.update(empty, IMG)
        assert out.shape[0] == 0
    # track expired; re-detection births a fresh id
    tr.update(d, IMG)  # may rebirth (no output if no live tracks)
    out = tr.update(d, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 4]) != 2


def test_ocr_recovers_track_from_last_observation():
    """After a gap, OCR matches leftover dets to last_observation boxes
    (ocsort.cpp:474-540)."""
    tr = small(min_hits=1, max_age=10)
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    tid = int(out[0, 4])
    empty = np.zeros((0, 6), np.float32)
    for _ in range(3):
        tr.update(empty, IMG)
    # reappears at the SAME spot: KF prediction drifted nowhere (zero
    # velocity), stage 1 should still match; same id either way
    out = tr.update(d, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 4]) == tid


def test_velocity_consistency_prefers_continuation():
    """Two tracks crossing: the velocity-direction cost keeps each paired
    with its own continuation."""
    tr = small(min_hits=1, inertia=0.4)
    for t in range(8):
        d = np.array(
            [
                det(100 + 20 * t, 100, 180 + 20 * t, 260),  # moving right
                det(420 - 20 * t, 104, 500 - 20 * t, 264),  # moving left
            ],
            np.float32,
        )
        out = tr.update(d, IMG)
    # both tracks alive with distinct ids after crossing
    assert out.shape[0] == 2
    assert len(set(out[:, 4].astype(int))) == 2


def test_byte_stage_uses_low_conf():
    tr = small(min_hits=1, use_byte=True, det_thresh=0.5)
    d_hi = np.array([det(100, 100, 200, 200, 0.9)], np.float32)
    tr.update(d_hi, IMG)
    out = tr.update(d_hi, IMG)
    tid = int(out[0, 4])
    # low-conf det at the same place: BYTE stage keeps the track updated
    d_lo = np.array([det(102, 102, 202, 202, 0.3)], np.float32)
    out = tr.update(d_lo, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 4]) == tid


def test_without_byte_low_conf_ignored():
    tr = small(min_hits=1, use_byte=False, det_thresh=0.5)
    d_hi = np.array([det(100, 100, 200, 200, 0.9)], np.float32)
    tr.update(d_hi, IMG)
    tr.update(d_hi, IMG)
    d_lo = np.array([det(102, 102, 202, 202, 0.3)], np.float32)
    out = tr.update(d_lo, IMG)
    assert out.shape[0] == 0  # tsu=1, not updated


def test_multi_object():
    tr = small(min_hits=1)
    d = np.array(
        [det(100, 100, 200, 200), det(400, 400, 500, 500, 0.8)],
        np.float32,
    )
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    assert out.shape[0] == 2
    assert len(set(out[:, 4].astype(int))) == 2


def test_unmatched_track_det_ind_zero_quirk():
    """Null update writes det_ind=0 (ocsort.cpp:87-88 runs before the
    size check)."""
    tr = small(min_hits=1, max_age=10)
    d = np.array(
        [det(100, 100, 200, 200), det(600, 600, 700, 700, 0.8)],
        np.float32,
    )
    tr.update(d, IMG)
    tr.update(d, IMG)
    # drop the second object; its track gets a null update
    out = tr.update(np.array([det(100, 100, 200, 200)], np.float32), IMG)
    assert out.shape[0] == 1
    # bring it back next frame: the track re-matches and would show
    # det_ind of its new detection; internal quirk is not observable in
    # output rows (unmatched tracks aren't emitted), so just confirm
    # the internal state took the 0
    state = tr._state
    import numpy as _np

    di = _np.asarray(state.det_ind)
    act = _np.asarray(state.active)
    assert 0 in di[act]


def test_empty_frames():
    tr = small(min_hits=1)
    out = tr.update(np.zeros((0, 6), np.float32), IMG)
    assert out.shape == (0, 8)
