"""Failure-injection robustness (SURVEY.md §5: the reference's numeric
guards — NaN pruning, degenerate boxes — must survive as masking)."""

import numpy as np
import pytest

import motcpp_tpu

IMG = np.zeros((480, 640, 3), np.uint8)

ALL = [
    "sort", "bytetrack", "ocsort", "deepocsort", "strongsort",
    "botsort", "boosttrack", "hybridsort", "ucmctrack",
]
KW = {
    "deepocsort": dict(embedding_off=True, cmc_off=True),
    "botsort": dict(with_reid=False),
    "hybridsort": dict(with_reid=False),
}


def _mk(name):
    kw = dict(KW.get(name, {}))
    kw.update(max_tracks=16, max_dets=8)
    return motcpp_tpu.create_tracker(name, **kw)


@pytest.mark.parametrize("name", ALL)
def test_nan_and_inf_detections_survive(name):
    tr = _mk(name)
    good = np.array([[100, 100, 200, 300, 0.9, 0]], np.float32)
    tr.update(good, IMG)
    poisoned = np.array(
        [
            [100, 100, 200, 300, 0.9, 0],
            [np.nan, np.nan, np.nan, np.nan, 0.9, 0],
            [50, 50, np.inf, np.inf, 0.8, 0],
        ],
        np.float32,
    )
    for _ in range(3):
        out = tr.update(poisoned, IMG)
        # outputs that exist must be finite
        if out.shape[0]:
            finite_rows = np.isfinite(out[:, :4]).all(axis=1)
            # a tracker may echo a poisoned detection once (e.g. OC-SORT
            # outputs raw observations) but must not emit NaN ids/conf
            assert np.isfinite(out[:, 4:6]).all(), (name, out)
            assert finite_rows.any() or out.shape[0] == 0
    # recovery: clean input keeps working afterwards
    out = tr.update(good, IMG)
    tr.update(good, IMG)
    out = tr.update(good, IMG)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ALL)
def test_degenerate_boxes(name):
    tr = _mk(name)
    degenerate = np.array(
        [
            [10, 10, 10, 10, 0.9, 0],      # zero area
            [50, 50, 40, 60, 0.8, 0],      # inverted x
            [100, 100, 101, 400, 0.9, 0],  # sliver
        ],
        np.float32,
    )
    for _ in range(4):
        out = tr.update(degenerate, IMG)
    # no crash; state machine still sane on clean input afterwards
    good = np.array([[200, 100, 300, 300, 0.95, 0]], np.float32)
    for _ in range(4):
        out = tr.update(good, IMG)
    assert out.shape[1] == 8


@pytest.mark.parametrize("name", ALL)
def test_capacity_saturation(name):
    """More persistent objects than track slots: no crash, stable ids
    for the tracked subset."""
    tr = _mk(name)  # 16 slots, 8 det capacity
    dets = np.zeros((8, 6), np.float32)
    for i in range(8):
        dets[i] = [70 * i + 5, 100, 70 * i + 60, 260, 0.9, 0]
    last = None
    for _ in range(6):
        last = tr.update(dets, IMG)
    assert last.shape[0] <= 16
    assert len(set(last[:, 4].astype(int))) == last.shape[0]
