"""bench.py is the driver-facing benchmark contract: it must print one
valid JSON line for any tracker, with and without the embedding path."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _run_bench(*args):
    r = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--cpu", "--streams", "8",
         "--frames", "4", "--repeats", "1", "--max-tracks", "16",
         "--max-dets", "8", "--objects", "4", *args],
        capture_output=True, text=True, timeout=900, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_json_contract_default_tracker():
    out = _run_bench()
    assert out["unit"] == "streams_at_30fps_per_chip"
    assert out["metric"] == "bytetrack_streams_at_30fps_per_chip"
    assert out["value"] > 0
    # value is rounded to 0.1 and vs_baseline to 1e-3 from the UNROUNDED
    # value, so allow both rounding granularities
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
