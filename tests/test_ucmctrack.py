"""UCMCTrack tests: ground-plane association, tentative lifecycle."""

import numpy as np
import pytest

from motcpp_tpu.models.ucmctrack import UCMCConfig, UCMCTrack, _map_dets

IMG = np.zeros((1080, 1920, 3), np.uint8)


def small(**kw):
    kw.setdefault("max_tracks", 32)
    kw.setdefault("max_dets", 16)
    return UCMCTrack(**kw)


def det(x1, y1, x2, y2, conf=0.9, cls=0):
    return [x1, y1, x2, y2, conf, cls]


def test_tentative_confirmation_cycle():
    """Birth -> 2 tentative matches -> Confirmed and emitted on frame 3."""
    tr = small()
    d = np.array([det(100, 100, 180, 300)], np.float32)
    assert tr.update(d, IMG).shape[0] == 0  # frame 1: tentative birth
    assert tr.update(d, IMG).shape[0] == 0  # frame 2: birth_count 1
    out = tr.update(d, IMG)  # frame 3: birth_count 2 -> confirmed
    assert out.shape[0] == 1
    assert int(out[0, 4]) == 1


def test_output_is_raw_detection_box():
    tr = small()
    d = np.array([det(100, 100, 180, 300)], np.float32)
    tr.update(d, IMG)
    tr.update(d, IMG)
    moved = np.array([det(111, 103, 191, 303)], np.float32)
    out = tr.update(moved, IMG)
    np.testing.assert_allclose(out[0, :4], moved[0, :4], atol=1e-4)
    assert out[0, 5] == pytest.approx(0.9)


def test_tentative_dies_after_one_miss():
    tr = small()
    d = np.array([det(100, 100, 180, 300)], np.float32)
    tr.update(d, IMG)
    tr.update(np.zeros((0, 6), np.float32), IMG)  # tentative death >= 2
    # reappearing needs a fresh id cycle
    tr.update(d, IMG)
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 4]) == 2


def test_low_conf_second_stage():
    tr = small(high_score=0.5)
    d = np.array([det(100, 100, 180, 300, 0.9)], np.float32)
    for _ in range(3):
        out = tr.update(d, IMG)
    tid = int(out[0, 4])
    # low-conf (>= det_thresh, < high_score) still matches via stage 2
    low = np.array([det(102, 102, 182, 302, 0.35)], np.float32)
    out = tr.update(low, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 4]) == tid


def test_coasted_survives_then_dies():
    tr = small(max_age=3)
    d = np.array([det(100, 100, 180, 300)], np.float32)
    for _ in range(3):
        tr.update(d, IMG)
    empty = np.zeros((0, 6), np.float32)
    # coasts for up to max_age frames
    tr.update(empty, IMG)
    out = tr.update(d, IMG)  # recovered within the window
    assert out.shape[0] == 1 and int(out[0, 4]) == 1
    # now exceed max_age
    for _ in range(4):
        tr.update(empty, IMG)
    tr.update(d, IMG)
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    assert out.shape[0] == 1 and int(out[0, 4]) != 1


def test_multi_object_ground_plane():
    tr = small()
    d = np.array(
        [det(100, 100, 180, 300), det(700, 200, 800, 500, 0.8)], np.float32
    )
    for _ in range(3):
        out = tr.update(d, IMG)
    assert out.shape[0] == 2
    assert len(set(out[:, 4].astype(int))) == 2


def test_mapper_with_calibration():
    """A simple calibrated camera: Ki/Ko produce finite ground-plane
    measurements with positive-definite noise."""
    import jax.numpy as jnp

    Ki = (1000.0, 0.0, 960.0, 0.0,
          0.0, 1000.0, 540.0, 0.0,
          0.0, 0.0, 1.0, 0.0)
    Ko = (1.0, 0.0, 0.0, 0.0,
          0.0, 0.0, 1.0, -3.0,
          0.0, -1.0, 0.0, 6.0,
          0.0, 0.0, 0.0, 1.0)
    cfg = UCMCConfig(Ki=Ki, Ko=Ko, max_dets=4)
    boxes = jnp.asarray([[900.0, 500.0, 1000.0, 700.0]])
    y, R = _map_dets(cfg, boxes)
    y, R = np.asarray(y), np.asarray(R)
    assert np.all(np.isfinite(y)) and np.all(np.isfinite(R))
    assert np.all(np.linalg.eigvalsh(R[0]) > 0)


def test_conf_below_det_thresh_ignored():
    tr = small(det_thresh=0.3)
    weak = np.array([det(100, 100, 180, 300, 0.2)], np.float32)
    for _ in range(4):
        out = tr.update(weak, IMG)
    assert out.shape[0] == 0
    assert not bool(np.asarray(tr._state.ustate != 0).any())
