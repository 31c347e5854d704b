"""Aux subsystem tests: per-class wrapper, checkpointing, profiling,
visualization."""

import numpy as np
import pytest

IMG = np.zeros((480, 640, 3), np.uint8)


def test_per_class_routing():
    from motcpp_tpu.models.per_class import PerClassTracker
    from motcpp_tpu.models.sort import Sort

    tr = PerClassTracker(
        lambda: Sort(min_hits=1, max_tracks=8, max_dets=4), nr_classes=3
    )
    dets = np.array(
        [
            [100, 100, 200, 200, 0.9, 0],
            [105, 105, 205, 205, 0.9, 1],  # overlapping but other class
            [400, 100, 500, 200, 0.8, 1],
        ],
        np.float32,
    )
    out = tr.update(dets, IMG)
    assert out.shape[0] == 3
    # classes never share tracks despite the overlap
    ids_by_cls = {}
    for r in out:
        ids_by_cls.setdefault(int(r[6]), set()).add(int(r[4]))
    assert len(ids_by_cls[0] & ids_by_cls[1]) == 0
    # id namespaces are disjoint by stride
    assert all(i < 100000 for i in ids_by_cls[0])
    assert all(i >= 100000 for i in ids_by_cls[1])
    # det_ind maps back to original rows
    det_inds = sorted(int(r[7]) for r in out)
    assert det_inds == [0, 1, 2]
    tr.reset()
    out = tr.update(dets, IMG)
    assert out.shape[0] == 3


def test_checkpoint_roundtrip(tmp_path):
    from motcpp_tpu.models.sort import Sort
    from motcpp_tpu.utils.checkpoint import load_tracker, save_tracker

    d = np.array([[100, 100, 200, 200, 0.9, 0]], np.float32)
    tr = Sort(min_hits=1, max_age=5, max_tracks=8, max_dets=4)
    for _ in range(3):
        tr.update(d, IMG)
    save_tracker(tr, tmp_path / "state.npz")

    # continue two diverging futures from the same checkpoint
    tr2 = Sort(min_hits=1, max_age=5, max_tracks=8, max_dets=4)
    tr2.update(d, IMG)  # build jit + state
    load_tracker(tr2, tmp_path / "state.npz")
    moved = np.array([[104, 104, 204, 204, 0.9, 0]], np.float32)
    a = tr.update(moved, IMG)
    b = tr2.update(moved, IMG)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_checkpoint_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from motcpp_tpu.models.sort import Sort
    from motcpp_tpu.utils.checkpoint import load_tracker, save_tracker

    d = np.array([[100, 100, 200, 200, 0.9, 0]], np.float32)
    tr = Sort(min_hits=1, max_tracks=8, max_dets=4)
    tr.update(d, IMG)
    save_tracker(tr, tmp_path / "ckpt")
    tr2 = Sort(min_hits=1, max_tracks=8, max_dets=4)
    load_tracker(tr2, tmp_path / "ckpt")
    assert int(np.asarray(tr2._state.frame_count)) == 1


def test_frame_timer():
    import time

    from motcpp_tpu.utils.profiling import FrameTimer

    t = FrameTimer(n_streams=4)
    for _ in range(5):
        with t:
            time.sleep(0.002)
    rep = t.report()
    assert rep["frames"] == 5
    assert rep["aggregate_fps"] > 0
    assert rep["streams_at_30fps"] == pytest.approx(rep["aggregate_fps"] / 30)


def test_plot_results_and_gif(tmp_path):
    from motcpp_tpu.utils.visualization import plot_results, save_gif

    tracks = np.array([[50, 50, 150, 200, 3, 0.9, 0, 0]], np.float32)
    frame = plot_results(IMG, tracks)
    assert frame.shape == IMG.shape
    assert frame.sum() > 0  # something was drawn
    save_gif([frame, frame], tmp_path / "demo.gif", fps=5)
    assert (tmp_path / "demo.gif").stat().st_size > 0


def test_id_to_color_deterministic():
    from motcpp_tpu.models.base import id_to_color

    assert id_to_color(7) == id_to_color(7)
    assert len(id_to_color(1)) == 3
    assert all(0 <= c <= 255 for c in id_to_color(42))


def test_obb_seven_col_quirk_parity():
    """The reference's de-facto OBB behavior: 7-col input autodetects
    as OBB but the cores hardcode conf=col4/cls=col5, so the angle
    column is read as confidence (SURVEY.md §2.5 note; reference
    tracker.cpp:168-177 autodetect). Trackers WITHOUT this repo's real
    OBB path (everything but SORT) keep that parity quirk: angle
    surfaces as conf, and an angle below det_thresh filters the
    detection entirely. SORT deliberately diverges — it rebuilds in
    rotated-IoU mode and emits (M, 9) with the angle tracked
    (tests/test_sort.py::TestObbTracking)."""
    import motcpp_tpu

    tr = motcpp_tpu.create_tracker("bytetrack", max_tracks=8,
                                   max_dets=4)
    # angle (col 4) = 0.9 acts as conf; real conf 0.3 lands in cls slot
    d = np.array([[150, 150, 80, 160, 0.9, 0.3, 0]], np.float32)
    out = tr.update(d, IMG)
    assert out.shape == (1, 8)
    assert out[0, 5] == np.float32(0.9)  # angle surfaced as conf

    tr2 = motcpp_tpu.create_tracker("bytetrack", max_tracks=8,
                                    max_dets=4, det_thresh=0.5,
                                    track_thresh=0.5)
    low = np.array([[150, 150, 80, 160, 0.2, 0.99, 0]], np.float32)
    out2 = tr2.update(low, IMG)
    assert out2.shape[0] == 0  # angle-as-conf below threshold: filtered

    # SORT: the real OBB path replaces the quirk
    tr3 = motcpp_tpu.create_tracker("sort", min_hits=1, max_tracks=8,
                                    max_dets=4)
    out3 = tr3.update(d, IMG)
    assert out3.shape == (1, 9)
    assert out3[0, 4] == np.float32(0.9)  # angle carried, col 4
    assert out3[0, 6] == np.float32(0.3)  # true conf, col 6


def test_plot_results_extras_and_grid(tmp_path):
    """Header banner, confidence labels, fading trajectories, grid."""
    import numpy as np

    from motcpp_tpu.utils.visualization import make_grid, plot_results

    tracks = np.array([[10, 30, 60, 120, 3, 0.87, 0, 0]], np.float32)
    history = {}
    frames = {}
    for name in ("a", "b"):
        f = plot_results(
            IMG, tracks, show_trajectories=True, history=history,
            show_conf=True, header=f"{name} frame 1",
        )
        assert f.shape == IMG.shape and f.dtype == np.uint8
        frames[name] = f
    assert 3 in history and len(history[3]) == 2
    grid = make_grid(frames, cols=2)
    h, w = IMG.shape[:2]
    assert grid.shape[0] >= h and grid.shape[1] >= 2 * w


def test_trajectory_history_capped():
    import numpy as np

    from motcpp_tpu.utils.visualization import plot_results

    history = {}
    for t in range(60):
        tracks = np.array([[t, 30, t + 50, 120, 1, 0.9, 0, 0]], np.float32)
        plot_results(IMG, tracks, show_trajectories=True, history=history,
                     trajectory_len=40)
    assert len(history[1]) == 40
