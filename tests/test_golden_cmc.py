"""CMC-active + embedding-active golden regression (VERDICT r1 #4).

A deterministic synthetic moving-camera scene drives LIVE CMC
estimation (ECC / SOF / SOFJax) and real per-identity embeddings with
dropout gaps through the five CMC/ReID trackers; outputs must stay
byte-identical to tests/golden_cmc (regenerate intentionally with
scripts/regen_golden_cmc.py).

Sensitivity is part of the pin: the warp path demonstrably changes the
output (cmc_method="none" diverges), so a warp-application or
gallery/EMA regression flips these goldens — unlike the MOT17-mini
goldens where dummy frames degenerate CMC to the identity warp.
"""

import sys
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent
GOLDEN = HERE / "golden_cmc"
sys.path.insert(0, str(HERE.parent / "scripts"))


def _runs():
    import regen_golden_cmc

    return regen_golden_cmc.RUNS


def _has_cv2():
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.parametrize(
    "name,tracker,kwargs,needs_cv2",
    [pytest.param(*r, id=r[0]) for r in (
        [
            ("botsort_ecc", "botsort", dict(cmc_method="ecc"), True),
            ("botsort_sofjax", "botsort", dict(cmc_method="sof_jax"), False),
            ("strongsort_ecc", "strongsort", {}, True),
            ("deepocsort_sof", "deepocsort", {}, True),
            ("boosttrack_ecc", "boosttrack", {}, True),
            ("hybridsort_ecc", "hybridsort", {}, True),
        ]
    )],
)
def test_cmc_embedding_golden(name, tracker, kwargs, needs_cv2):
    if needs_cv2 and not _has_cv2():
        pytest.skip("OpenCV unavailable (ECC/SOF estimators)")
    from regen_golden_cmc import run_scene

    golden = GOLDEN / f"{name}.txt"
    assert golden.exists(), f"missing golden {golden}"
    got = run_scene(tracker, kwargs)
    assert got == golden.read_text(), (
        f"{name} diverged from golden_cmc — if intentional, run "
        "scripts/regen_golden_cmc.py"
    )


def test_cmc_warp_path_is_live():
    """The pin is meaningful only if the warp path changes the output:
    disabling CMC must diverge from the ECC golden."""
    from regen_golden_cmc import run_scene

    got = run_scene("botsort", dict(cmc_method="none"))
    assert got != (GOLDEN / "botsort_ecc.txt").read_text()


def test_embedding_path_is_live():
    """The gallery/EMA paths must USE the embeddings: on a crossing
    scene with an occlusion gap (position alone is ambiguous at
    re-match), distinct vs degenerate embeddings must produce different
    ID assignments for at least one ReID tracker."""
    import numpy as np

    import motcpp_tpu

    T, D = 24, 16
    img = np.full((240, 320, 3), 127, np.uint8)  # constant -> identity CMC
    e1 = np.zeros(D, np.float32); e1[0] = 1.0
    e2 = np.zeros(D, np.float32); e2[1] = 1.0

    def scene(t):
        """Two STATIONARY boxes (KF predicts them in place), occluded
        frames 10-12, reappearing shuffled toward the midpoint so each
        det has near-equal IoU to both predictions — appearance is the
        only disambiguator at re-match."""
        if 10 <= t <= 12:
            return np.zeros((0, 6), np.float32), np.zeros((0, D), np.float32)
        if t < 10:
            xa, xb = 100.0, 160.0  # A (e1) left, B (e2) right
        else:
            xa, xb = 135.0, 125.0  # both near the midpoint, A now right
        dets = np.asarray(
            [[xa, 80, xa + 40, 160, 0.9, 0], [xb, 80, xb + 40, 160, 0.9, 0]],
            np.float32,
        )
        return dets, np.stack([e1, e2])

    def id_trace(degenerate):
        results = {}
        tracker = motcpp_tpu.create_tracker(
            "strongsort", max_dets=8, max_tracks=16
        )
        for t in range(T):
            dets, embs = scene(t)
            if degenerate and embs.size:
                embs = np.tile(e1, (embs.shape[0], 1))
            out = np.asarray(tracker.update(dets, img, embs))
            for row in out:
                # map emitted id -> sorted x positions over time
                results.setdefault(int(row[4]), []).append(float(row[0]))
        return results

    real = id_trace(False)
    degen = id_trace(True)
    assert real != degen, (
        "embeddings had no effect on strongsort's crossing re-association"
    )
