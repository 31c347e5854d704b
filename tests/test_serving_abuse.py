"""Serving abuse: adversarial input through the mux must never kill the
worker and must keep tick latency bounded (VERDICT r2 #8 — the test
class that would have caught the e9e782b profile crash before it
shipped).

The reference's closest analogues are its per-frame NaN guards
(reference: sort.cpp:129-137, ocsort.cpp:352-365) and the eval tool's
try/catch with dummy-image retry (motcpp_eval.cpp:414-447); a serving
runtime needs the same guarantees against hostile *streams*.
"""

import time

import numpy as np
import pytest

from motcpp_tpu.serving import TrackingService

# generous CPU-CI bound per tick; the point is "no runaway/crash", not
# a throughput claim (TPU ticks are milliseconds)
TICK_BUDGET_S = 30.0


def _service(lap="jv", n_streams=2, max_dets=16, **tracker_kw):
    import jax

    return TrackingService.from_tracker(
        "bytetrack", n_streams=n_streams, max_dets=max_dets,
        tracker_kw=dict(max_tracks=32, lap_impl=lap, **tracker_kw),
        devices=jax.devices()[:1],
    )


def _tick(svc, h, dets):
    svc.submit(h, dets)
    t0 = time.time()
    batch = svc.step()
    assert time.time() - t0 < TICK_BUDGET_S
    rows = batch.tracks_for(h)
    assert np.isfinite(rows).all(), rows
    return rows


def test_nan_inf_detections_survive():
    """NaN/inf coordinates and confidences must neither crash the step
    nor leak non-finite values into emissions."""
    svc = _service()
    h = svc.attach()
    rng = np.random.default_rng(0)
    for t in range(8):
        d = np.zeros((6, 6), np.float32)
        d[:, 0] = rng.uniform(0, 500, 6)
        d[:, 1] = rng.uniform(0, 300, 6)
        d[:, 2] = d[:, 0] + 50
        d[:, 3] = d[:, 1] + 100
        d[:, 4] = 0.9
        if t % 2:
            d[0, 0] = np.nan
            d[1, 4] = np.inf
            d[2, 2] = -np.inf
            d[3, :4] = np.nan
        _tick(svc, h, d)


def test_degenerate_boxes_survive():
    """Zero-area, inverted (x2 < x1), and hugely out-of-frame boxes."""
    svc = _service()
    h = svc.attach()
    cases = [
        [[10, 10, 10, 10, 0.9, 0]],              # zero area
        [[100, 100, 50, 40, 0.9, 0]],            # inverted
        [[-1e8, -1e8, 1e8, 1e8, 0.9, 0]],        # absurd extent
        [[0, 0, 1e-6, 1e-6, 0.99, 0]],           # sub-pixel
        [[5000, 5000, 5060, 5200, 0.9, 0]],      # far outside frame
    ]
    for c in cases:
        for _ in range(3):
            _tick(svc, h, np.asarray(c, np.float32))


@pytest.mark.parametrize("lap", ["jv", "auction"])
def test_near_tie_cost_flood(lap):
    """The e9e782b input class at serving shape: many near-identical
    boxes produce an all-near-tie cost matrix — the worst case for the
    auction's bidding-war length. Every tick must complete within the
    budget with a valid assignment for BOTH solvers."""
    svc = _service(lap=lap, max_dets=16)
    h = svc.attach()
    rng = np.random.default_rng(1)
    base = np.asarray([200.0, 150.0, 260.0, 330.0], np.float32)
    for t in range(6):
        d = np.zeros((16, 6), np.float32)
        # 16 boxes within half a pixel of each other: near-tie flood
        d[:, :4] = base + rng.uniform(-0.5, 0.5, (16, 4)).astype(np.float32)
        d[:, 4] = 0.9 + rng.uniform(-1e-4, 1e-4, 16).astype(np.float32)
        rows = _tick(svc, h, d)
        # duplicate suppression holds: never more tracks than dets
        assert rows.shape[0] <= 16


def test_sustained_overflow_drop_oldest():
    """Producers outpacing the stepper: queue overflows drop the OLDEST
    frame, the dropped counter advances, and the stream stays live and
    exact (continues from whatever frames survived)."""
    svc = _service()
    h = svc.attach()
    depth = svc.mux.queue_depth
    for burst in range(3):
        for i in range(depth * 4):  # 4x oversubmit
            x = 10.0 + 3 * i
            svc.submit(h, np.asarray([[x, 10, x + 60, 130, 0.9, 0]],
                                     np.float32))
        assert svc.pending(h) == depth
        t0 = time.time()
        batch = svc.step()
        assert time.time() - t0 < TICK_BUDGET_S
        assert np.isfinite(batch.tracks_for(h)).all()
    stats = svc.stats()
    assert stats["dropped"] >= 3 * depth * 3  # 3 bursts x 3*depth evicted
    assert stats["submitted"] == 3 * depth * 4


def test_attach_detach_storm_with_stale_handles():
    """Rapid attach/detach cycling: stale handles are rejected, slots
    recycle cleanly, and live streams keep tracking."""
    svc = _service(n_streams=2)
    stale = []
    for cycle in range(6):
        h = svc.attach()
        svc.submit(h, np.asarray([[10, 10, 70, 130, 0.9, 0]], np.float32))
        svc.step()
        svc.detach(h)
        stale.append(h)
    h = svc.attach()
    for s in stale:
        if s.slot == h.slot:
            with pytest.raises(ValueError, match="stale"):
                svc.submit(s, np.zeros((0, 6), np.float32))
    rows = _tick(svc, h, np.asarray([[10, 10, 70, 130, 0.9, 0]],
                                    np.float32))
    assert rows.shape[1] == 8


def test_empty_and_all_low_conf_frames():
    """Empty frames and all-below-threshold frames age tracks without
    emitting garbage."""
    svc = _service()
    h = svc.attach()
    good = np.asarray([[10, 10, 70, 130, 0.9, 0]], np.float32)
    for _ in range(3):
        _tick(svc, h, good)
    assert _tick(svc, h, np.zeros((0, 6), np.float32)).shape[0] <= 1
    low = np.asarray([[10, 10, 70, 130, 0.02, 0]], np.float32)
    for _ in range(3):
        rows = _tick(svc, h, low)
        assert (rows[:, 5] > 0.02).all() if rows.shape[0] else True
