"""Ablation-scale accuracy scoreboard + reference-band ordering pins
(VERDICT r2 #1).

Runs all 9 trackers (10 rows) at the reference eval tool's configs over
the 600-frame calibrated synthetic scene and asserts:

* the committed scoreboard (tests/accuracy_ablation.json) reproduces,
* the relative orderings published for the reference on the MOT17
  ablation split (BASELINE.md: ByteTrack 66.5 > OC-SORT 64.6 ~ UCMC
  64.0 > SORT 62.4 HOTA; ByteTrack IDF1 77.6 > SORT 69.2) hold at this
  scale,
* the MOT17-mini MT=0 anomalies (StrongSORT/UCMC, VERDICT r2 "weak #1")
  do NOT reproduce at 600 frames — they are confirmation warm-up
  artifacts of the 4/8-frame mini GT window (see
  tests/test_accuracy_real.py::test_warmup_window_diagnosis for the
  direct demonstration on the mini window itself).

BoostTrack is the one reference-band divergence, with a pinned
mechanism rather than an ordering assertion: the reference gates the
FUSED cost at iou_threshold (reference src/trackers/boosttrack.cpp:
612-620 — lambda_emb = 3.0 and emb_sim baseline 0.5 push every
det/track pair ~1.5 below the 0.3 gate), so with_reid disables the
cost-limit gate in practice and lost tracks capture newly-entering
objects. On the low-churn real MOT17 ablation split this rarely fires
(reference posts its best HOTA there); on a churny scene it costs
~7 HOTA (boosttrack vs boosttrack-noreid rows).
test_boosttrack_reid_gate_bypass pins the mechanism itself.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import motcpp_tpu

TABLE = Path(__file__).resolve().parent / "accuracy_ablation.json"
EXPECTED = json.loads(TABLE.read_text()) if TABLE.exists() else {}

_cache = {}


def scoreboard():
    if "r" not in _cache:
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from scripts.ablation_benchmark import run_scoreboard

        _cache["r"] = run_scoreboard(n_frames=600, progress=lambda s: None)
    return _cache["r"]


# the 600-frame 10-row scoreboard costs minutes of CPU; it runs by
# default (it IS the accuracy evidence) but -m 'not slow' skips it for
# quick iteration
slow = pytest.mark.slow


@slow
@pytest.mark.parametrize("tracker", sorted(EXPECTED))
def test_committed_scoreboard_reproduces(tracker):
    got = scoreboard()[tracker]
    want = EXPECTED[tracker]
    for key in ("HOTA", "MOTA", "IDF1", "DetA", "AssA"):
        assert got[key] == pytest.approx(want[key], abs=0.5), (
            f"{tracker} {key}: measured {got[key]:.2f} vs committed "
            f"{want[key]:.2f} — if intentional, regenerate with "
            "scripts/ablation_benchmark.py --write"
        )


@slow
def test_reference_band_orderings():
    """The reference's published MOT17-ablation orderings (BASELINE.md)
    hold on the ablation-scale scene."""
    r = scoreboard()
    # ByteTrack above SORT on HOTA and IDF1 (ref: 66.5>62.4, 77.6>69.2)
    assert r["bytetrack"]["HOTA"] > r["sort"]["HOTA"] + 2
    assert r["bytetrack"]["IDF1"] > r["sort"]["IDF1"] + 4
    # OC-SORT and UCMCTrack land in a close band below ByteTrack
    # (ref: within 2.0/2.5; allow wider on the harder synthetic scene)
    for name in ("ocsort", "ucmctrack"):
        assert r[name]["HOTA"] > r["sort"]["HOTA"], name
        assert r["bytetrack"]["HOTA"] - r[name]["HOTA"] < 8, name
    # OC-SORT ~ UCMC near-tie (ref gap 0.6)
    assert abs(r["ocsort"]["HOTA"] - r["ucmctrack"]["HOTA"]) < 5
    # SORT pays in association, not detection (ref: lowest IDF1 row)
    assert r["sort"]["IDF1"] == min(
        r[k]["IDF1"] for k in ("sort", "bytetrack", "ocsort", "ucmctrack")
    )
    assert r["sort"]["IDSW"] == max(
        r[k]["IDSW"] for k in ("sort", "bytetrack", "ocsort", "ucmctrack")
    )


@slow
def test_no_warmup_collapse_at_scale():
    """StrongSORT (n_init=3) and UCMCTrack (Tentative birth) posted
    MT=0 on the 4/8-frame mini window; at 600 frames both must track
    the majority of identities — the mini rows are warm-up artifacts,
    not association bugs."""
    r = scoreboard()
    for name in ("strongsort", "ucmctrack"):
        assert r[name]["MT"] >= 50, (name, r[name])
        assert r[name]["HOTA"] >= r["bytetrack"]["HOTA"] - 12, (name, r[name])
    # every tracker tracks a healthy share of the ~100 identities
    for name, m in r.items():
        assert m["MT"] >= 40, (name, m)
        assert m["ML"] <= 10, (name, m)
        assert m["HOTA"] >= 60, (name, m)


def test_boosttrack_reid_gate_bypass():
    """Mechanism pin for the BoostTrack scoreboard divergence: the
    fused-cost gate (reference boosttrack.cpp:612-620) admits ANY
    det/track pair once with_reid subtracts lambda_emb * emb_sim
    (baseline 0.5 -> -1.5 on every pair), so a lost track captures a
    far-away new object's detection; without reid the same detection
    correctly births a new ID."""
    img = np.zeros((1080, 1920, 3), np.uint8)

    def run(with_reid):
        tr = motcpp_tpu.create_tracker(
            "boosttrack", max_tracks=16, max_dets=8, min_hits=1,
            with_reid=with_reid,
        )
        e = np.zeros((1, 16), np.float32)
        e[0, 0] = 1.0
        # confirm a track at A for 5 frames
        for t in range(5):
            d = np.array([[100, 100, 180, 300, 0.95, 0]], np.float32)
            out = tr.update(d, img, e if with_reid else None)
        id_a = int(out[0, 4])
        # object A vanishes; a NEW object appears far away with an
        # orthogonal embedding
        e2 = np.zeros((1, 16), np.float32)
        e2[0, 1] = 1.0
        ids = []
        for t in range(4):
            d = np.array([[1500, 700, 1580, 900, 0.95, 0]], np.float32)
            out = tr.update(d, img, e2 if with_reid else None)
            ids.extend(out[:, 4].astype(int).tolist())
        return id_a, set(ids)

    id_a, ids_reid = run(True)
    assert ids_reid == {id_a}, (
        "with_reid: fused-cost gate bypass must let the lost track "
        f"capture the distant new object (got {ids_reid}, old {id_a})"
    )
    id_a2, ids_noreid = run(False)
    assert id_a2 not in ids_noreid and len(ids_noreid) == 1, (
        "without reid the gate must hold and a fresh ID must be born"
        f" (got {ids_noreid}, old {id_a2})"
    )


REPLICA = Path(__file__).resolve().parent / "replica_comparison.json"

# configs whose metrics the reference binary reproduces to the last
# digit on the identical no-pan scene (docs/accuracy.md)
EXACT_PARITY = [
    "sort", "bytetrack", "ocsort", "ucmctrack", "deepocsort",
    "boosttrack", "boosttrack-noreid", "hybridsort-noreid",
]


@slow
def test_reference_binary_parity_no_pan():
    """Same-scene parity vs the reference BINARY (VERDICT r3 #1/#4):
    this implementation must reproduce the committed replica-run
    metrics (scripts/ref_replica/, tests/replica_comparison.json) of
    the reference C++ trackers within 0.05 metric points / 2 switches
    on the exact-parity configs — an absolute calibration far tighter
    than the old README-band orderings (±5-8 HOTA)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.ablation_benchmark import SCOREBOARD, run_scoreboard

    table = json.loads(REPLICA.read_text())
    ref = table["reference"]
    got = run_scoreboard(
        n_frames=600,
        trackers=[t for t in EXACT_PARITY if t in SCOREBOARD],
        progress=lambda s: None,
        pan_amp=(0.0, 0.0),
        use_warps=False,
    )
    for name, m in got.items():
        want = ref[name]
        for key in ("HOTA", "MOTA", "IDF1", "AssA"):
            assert m[key] == pytest.approx(want[key], abs=0.05), (
                f"{name} {key}: {m[key]} vs reference binary {want[key]}"
            )
        assert abs(m["IDSW"] - want["IDSW"]) <= 2, (name, m["IDSW"], want["IDSW"])


@slow
def test_strongsort_beats_reference_binary():
    """StrongSORT: the faithful architecture oscillates duplicate
    tracks (see test_duplicate_track_oscillation_mechanism); this
    implementation's budget-ring gallery must stay an order of
    magnitude more ID-stable than the reference binary's committed
    replica run (3,991 IDSW) on the same scene, and above its HOTA."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.ablation_benchmark import run_scoreboard

    ref = json.loads(REPLICA.read_text())["reference"]["strongsort"]
    got = run_scoreboard(
        n_frames=600, trackers=["strongsort"], progress=lambda s: None,
        pan_amp=(0.0, 0.0), use_warps=False,
    )["strongsort"]
    assert got["IDSW"] * 10 < ref["IDSW"], (got["IDSW"], ref["IDSW"])
    assert got["HOTA"] > ref["HOTA"] + 5


def test_deployed_operating_points_accuracy_cost():
    """bench.py's DEPLOYED live-ReID operating points must each have a
    measured HOTA cost <=1.0 vs every-frame embedding on the committed
    600-frame artifacts (tests/accuracy_cadence.json for cadence
    points, tests/accuracy_budget.json for priority-budget points).
    Pins the serving operating points documented in
    docs/benchmarking.md: if a remeasurement moves a cost, this fails
    until the deployed table and docs are updated together. Also pins
    WHY the priority policy exists: at the same 50% CNN load, plain
    confidence-ordered budgeting costs StrongSORT >10 HOTA where the
    priority policy costs ~1.4."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import DEPLOYED

    cad = json.loads(
        (Path(__file__).resolve().parent / "accuracy_cadence.json")
        .read_text()
    )
    bud = json.loads(
        (Path(__file__).resolve().parent / "accuracy_budget.json")
        .read_text()
    )
    for trk, dep in DEPLOYED.items():
        base = cad[trk]["1"]["HOTA"]
        mode, val = dep[0], dep[1]
        if mode == "--emb-cadence":
            got = cad[trk][val]["HOTA"]
        else:
            assert mode == "--emb-priority", dep
            got = bud[trk][f"priority_{val}"]["HOTA"]
        assert base - got <= 1.0, (trk, dep, base, got)
        # cadence points stay the LARGEST k within the policy line
        if mode == "--emb-cadence":
            k = int(val)
            larger = [int(c) for c in cad[trk] if int(c) > k]
            if larger:
                nxt = str(min(larger))
                assert base - cad[trk][nxt]["HOTA"] > 1.0, (trk, nxt)
    # the contrast row that justifies priority over confidence order
    base_ss = cad["strongsort"]["1"]["HOTA"]
    assert base_ss - bud["strongsort"]["conf_0.5"]["HOTA"] > 10.0
    assert base_ss - bud["strongsort"]["priority_0.5"]["HOTA"] < 2.0
