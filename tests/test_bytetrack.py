"""ByteTrack tests (model: reference tests/test_bytetrack.cpp + the C++
behavioral quirks documented in models/bytetrack.py)."""

import numpy as np
import pytest

from motcpp_tpu.models.bytetrack import ByteTrack

IMG = np.zeros((480, 640, 3), np.uint8)
HIGH = np.array(
    [[100, 100, 200, 200, 0.9, 0], [300, 300, 400, 400, 0.85, 0]],
    np.float32,
)
MIXED = np.array(
    [
        [100, 100, 200, 200, 0.9, 0],
        [300, 300, 400, 400, 0.3, 0],
        [500, 400, 600, 470, 0.15, 0],
    ],
    np.float32,
)


def small(**kw):
    kw.setdefault("max_tracks", 32)
    kw.setdefault("max_dets", 16)
    return ByteTrack(**kw)


def test_initialization():
    ByteTrack()


def test_first_frame_tracks_activated_immediately():
    # frame 1: activate() sets is_activated (bytetrack.cpp:44-46)
    tr = small()
    tracks = tr.update(HIGH, IMG)
    assert tracks.shape == (2, 8)
    assert set(tracks[:, 4].astype(int)) == {1, 2}


def test_new_track_after_frame1_needs_second_hit():
    tr = small()
    tr.update(HIGH, IMG)
    # frame 2: a brand-new object -> unconfirmed, NOT emitted
    newobj = np.array([[500, 100, 600, 200, 0.95, 0]], np.float32)
    tracks = tr.update(np.vstack([HIGH, newobj]), IMG)
    assert tracks.shape[0] == 2
    # frame 3: matched again via the unconfirmed stage -> now emitted
    tracks = tr.update(np.vstack([HIGH, newobj]), IMG)
    assert tracks.shape[0] == 3


def test_two_stage_association_output_format():
    tr = small()
    tracks = tr.update(MIXED, IMG)
    assert tracks.shape[1] == 8
    for row in tracks:
        assert row[0] < row[2] and row[1] < row[3]


def test_low_conf_keeps_track_alive_second_stage():
    tr = small()
    det1 = np.array([[100, 100, 200, 200, 0.9, 0]], np.float32)
    t1 = tr.update(det1, IMG)
    assert t1.shape[0] == 1
    tid = int(t1[0, 4])
    # occluded: low-confidence detection at the same spot
    det2 = np.array([[100, 100, 200, 200, 0.3, 0]], np.float32)
    t2 = tr.update(det2, IMG)
    # second-stage match keeps the same identity
    assert t2.shape[0] == 1
    assert int(t2[0, 4]) == tid
    assert t2[0, 5] == pytest.approx(0.3)


def test_conf_equal_track_thresh_in_neither_bucket():
    """Strict inequalities: conf == track_thresh is neither high nor
    second (bytetrack.cpp:189-193)."""
    tr = small(track_thresh=0.45)
    det = np.array([[100, 100, 200, 200, 0.45, 0]], np.float32)
    tracks = tr.update(det, IMG)
    assert tracks.shape[0] == 0


def test_lost_track_recovered_within_buffer():
    tr = small(track_buffer=25)
    det = np.array([[100, 100, 200, 200, 0.9, 0]], np.float32)
    tr.update(det, IMG)
    tid = int(tr.update(det, IMG)[0, 4])
    # vanish for 3 frames, but keep a second low det elsewhere so the
    # second stage runs and the track is properly marked lost
    far_low = np.array([[500, 400, 600, 470, 0.3, 0]], np.float32)
    for _ in range(3):
        out = tr.update(far_low, IMG)
        assert out.shape[0] == 0  # lost track not emitted
    # reappears -> stage-1 re_activate with the SAME id
    out = tr.update(det, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 4]) == tid


def test_lost_track_expires_after_buffer():
    tr = small(track_buffer=2, frame_rate=30)  # max_time_lost = 2
    det = np.array([[100, 100, 200, 200, 0.9, 0]], np.float32)
    tr.update(det, IMG)
    tr.update(det, IMG)
    far_low = np.array([[500, 400, 600, 470, 0.3, 0]], np.float32)
    for _ in range(4):
        tr.update(far_low, IMG)
    # buffer exceeded -> reappearance gets a NEW id
    out = tr.update(det, IMG)
    assert out.shape[0] == 0 or all(int(r[4]) != 1 for r in out)
    out = tr.update(det, IMG)  # unconfirmed -> confirmed
    assert out.shape[0] == 1
    assert int(out[0, 4]) != 1


def test_empty_frames_no_crash_and_zombie_semantics():
    """With no second-stage dets the C++ reference never marks unmatched
    tracks lost — they remain emitted with their stale box
    (bytetrack.cpp:387 gate). We replicate that exactly."""
    tr = small()
    det = np.array([[100, 100, 200, 200, 0.9, 0]], np.float32)
    tr.update(det, IMG)
    out = tr.update(np.zeros((0, 6), np.float32), IMG)
    assert out.shape[0] == 1  # zombie track still emitted (C++ behavior)
    np.testing.assert_allclose(out[0, :4], det[0, :4], atol=2.0)


def test_duplicate_suppression():
    tr = small()
    det = np.array([[100, 100, 200, 200, 0.9, 0]], np.float32)
    tr.update(det, IMG)
    tr.update(det, IMG)
    # force a lost twin: detection disappears with a far low det present
    far_low = np.array([[500, 400, 600, 470, 0.3, 0]], np.float32)
    tr.update(far_low, IMG)
    # new high det at the same place births an unconfirmed track while
    # the lost twin lingers; after it confirms, duplicate removal keeps
    # exactly one track there
    tr.update(det, IMG)
    out = tr.update(det, IMG)
    rows_at_100 = [r for r in out if abs(r[0] - 100) < 30]
    assert len(rows_at_100) == 1


def test_frame_rate_scales_buffer():
    tr30 = small(track_buffer=25, frame_rate=30)
    tr60 = small(track_buffer=25, frame_rate=60)
    assert tr30.cfg.max_time_lost == 25
    assert tr60.cfg.max_time_lost == 50


def test_det_ind_column_points_to_original_row():
    tr = small()
    dets = np.array(
        [
            [500, 400, 600, 470, 0.2, 0],  # low conf, second bucket
            [100, 100, 200, 200, 0.9, 0],  # high
        ],
        np.float32,
    )
    out = tr.update(dets, IMG)
    assert out.shape[0] == 1
    assert int(out[0, 7]) == 1


def test_stage2_skip_keeps_unmatched_tracked_emitted():
    """Reference quirk: the stage-2 mark_lost loop lives INSIDE the
    non-empty guard (bytetrack.cpp:387-443), so on a frame with NO
    low-conf detections an unmatched Tracked track is neither updated
    nor marked Lost — it is emitted with its last state and stale
    det_ind. (Found by fuzzing; pinned so a 'cleanup' doesn't silently
    diverge from the reference.)"""
    import numpy as np

    import motcpp_tpu

    img = np.zeros((480, 640, 3), np.uint8)
    tr = motcpp_tpu.create_tracker("bytetrack", max_dets=8, max_tracks=16)
    # frame 1: two well-separated high-conf dets -> two tracks
    two = np.array(
        [[50, 50, 120, 220, 0.95, 0], [400, 50, 470, 220, 0.95, 0]],
        np.float32,
    )
    tr.update(two, img)
    out1 = tr.update(two, img)
    assert out1.shape[0] == 2
    # frame 3: only det 0 present, NO low-conf dets -> stage 2 skipped;
    # track 2 must still be emitted (not Lost), with stale det_ind=1
    one = np.array([[50, 50, 120, 220, 0.95, 0]], np.float32)
    out2 = tr.update(one, img)
    assert out2.shape[0] == 2, out2
    ids1 = set(int(r[4]) for r in out1)
    ids2 = set(int(r[4]) for r in out2)
    assert ids1 == ids2
    stale = [r for r in out2 if int(r[7]) == 1]
    assert len(stale) == 1  # the unmatched track carries det_ind=1
    # whereas WITH a low-conf det present (stage 2 runs and misses),
    # the unmatched track goes Lost and is not emitted
    tr2 = motcpp_tpu.create_tracker("bytetrack", max_dets=8, max_tracks=16)
    tr2.update(two, img)
    tr2.update(two, img)
    one_plus_low = np.array(
        [[50, 50, 120, 220, 0.95, 0], [600, 400, 620, 460, 0.2, 0]],
        np.float32,
    )
    out3 = tr2.update(one_plus_low, img)
    assert out3.shape[0] == 1, out3
