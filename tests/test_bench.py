"""bench.py is the driver-facing benchmark contract: it must print one
valid JSON line for any tracker, with and without the embedding path."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _run_bench_raw(*args):
    r = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--cpu", "--streams", "8",
         "--frames", "4", "--repeats", "1", "--max-tracks", "16",
         "--max-dets", "8", "--objects", "4", *args],
        capture_output=True, text=True, timeout=1800, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr
    return [json.loads(line) for line in r.stdout.strip().splitlines()]


def _run_bench(*args):
    return _run_bench_raw(*args)[-1]


def test_bench_default_emits_full_scoreboard_bytetrack_last():
    """--quick: one JSON line per tracker (all 9), flagship LAST so
    a single-line (tail -1) parse lands on ByteTrack (VERDICT r1 #7).
    (The non-quick default adds capacity + live-ReID rows BEFORE the
    final bytetrack row — covered by test_bench_capacity_row and
    tests/test_parallel.py live-ReID tests; running OSNet x1_0 on the
    CPU CI backend is minutes-slow, hence --quick here.)"""
    rows = _run_bench_raw("--quick")
    assert len(rows) == 9
    metrics = [r["metric"] for r in rows]
    assert metrics[-1] == "bytetrack_streams_at_30fps_per_chip"
    assert len(set(metrics)) == 9
    for out in rows:
        assert out["unit"] == "streams_at_30fps_per_chip"
        assert out["value"] > 0
        # value is rounded to 0.1 and vs_baseline to 1e-3 from the
        # UNROUNDED value, so allow both rounding granularities
        assert out["vs_baseline"] == pytest.approx(
            out["value"] / 256.0, abs=0.05 / 256.0 + 5e-4 + 1e-9
        )


def test_bench_emb_path():
    out = _run_bench("--tracker", "strongsort", "--emb-dim", "16")
    assert out["metric"].startswith("strongsort")
    assert out["value"] > 0


def test_bench_jv_impl():
    out = _run_bench("--lap", "jv", "--tracker", "sort")
    assert out["value"] > 0


def test_bench_capacity_row():
    """The capacity-scaling rows (VERDICT r2 #4) run and emit the
    suffixed metric; in-process to keep CI time bounded."""
    import argparse

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(ROOT))
    import bench

    args = argparse.Namespace(
        streams=8, frames=3, repeats=1, max_tracks=16, max_dets=8,
        objects=4, lap="jv", emb_dim=0, cmc=False, quick=False,
        tracker="", cpu=True,
    )
    suffix, ov = bench.CAPACITY_ROWS[0]
    row = dict(ov)
    row["streams"] = 8
    out = bench.bench_one("bytetrack", args, row, suffix)
    assert out["metric"] == f"bytetrack{suffix}_streams_at_30fps_per_chip"
    assert out["value"] > 0
    # the full-default row plan: 8 base rows, capacity rows, live-ReID
    # rows, flagship last
    assert bench.ALL_TRACKERS[-1] == "bytetrack"
    assert set(bench.CAPACITY_TRACKERS) <= set(bench.ALL_TRACKERS)
