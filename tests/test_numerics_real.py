"""Numerics claims settled on REAL data (VERDICT r1 #6).

(a) The auction assignment solver (the TPU-fast kernel bench.py uses)
    must be metric-neutral vs exact Jonker-Volgenant on the real
    MOT17-mini runs — HOTA/MOTA/IDF1 deltas < 0.1 for every tracker.
    This is the claim ops/auction.py makes (epsilon-optimal differences
    below tracking-metric resolution), previously tested only on easy
    synthetic scenes; MOT17-04 has ~27 detections/frame with near-tie
    costs, the actual stress case. (Pallas-auction == jnp-auction is
    pinned separately in test_auction.py.)

(b) UCMCTrack runs f32 where the reference computes in double
    (reference: src/trackers/ucmc.cpp:33-50 uses Eigen double); the
    docstring claim that f32 parity "holds well within the 0.1 band" is
    verified here by an x64 A/B run on the same data.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent
ROOT = HERE.parent
MOT_MINI = ROOT / "assets" / "MOT17-mini" / "train"
TABLE = HERE / "accuracy_mot17mini.json"

needs_assets = pytest.mark.skipif(
    not (MOT_MINI.exists() and TABLE.exists()),
    reason="MOT17-mini assets not available",
)

EXPECTED = json.loads(TABLE.read_text()) if TABLE.exists() else {}
KEYS = ("HOTA", "MOTA", "IDF1")


def _evaluate_dir(out_dir: Path) -> dict:
    from motcpp_tpu.metrics import combine_metrics, evaluate_sequence

    rows = []
    for res in sorted(out_dir.glob("*.txt")):
        gt = MOT_MINI / res.stem / "gt" / "gt.txt"
        rows.append(evaluate_sequence(gt, res))
    return combine_metrics(rows)


@needs_assets
@pytest.mark.parametrize("tracker", sorted(EXPECTED))
def test_auction_metric_parity_on_real_data(tracker, tmp_path):
    """--lap auction over the scored window must land within 0.1 of the
    pinned exact-JV numbers on every metric."""
    from motcpp_tpu.cli import main as cli_main

    out = tmp_path / tracker
    rc = cli_main(
        [str(MOT_MINI), str(out), tracker,
         "--max-dets", "128", "--max-tracks", "128", "--cpu",
         "--lap", "auction", "--no-ablation", "--limit-frames", "8"]
    )
    assert rc == 0
    got = _evaluate_dir(out)
    for k in KEYS:
        assert abs(got[k] - EXPECTED[tracker][k]) < 0.1, (
            f"{tracker} {k}: auction {got[k]:.3f} vs jv "
            f"{EXPECTED[tracker][k]:.3f} — auction solver is no longer "
            "metric-neutral on real data"
        )


@needs_assets
def test_ucmc_f32_vs_f64_on_real_data(tmp_path):
    """UCMCTrack under jax_enable_x64 (reference precision) must land
    within 0.1 of the pinned f32 numbers (run in a subprocess: x64 is a
    process-global flag)."""
    out = tmp_path / "ucmc_x64"
    code = (
        "import jax;"
        "jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_enable_x64', True);"
        "from motcpp_tpu.cli import main;"
        f"raise SystemExit(main([{str(MOT_MINI)!r}, {str(out)!r}, 'ucmctrack',"
        "'--max-dets', '128', '--max-tracks', '128',"
        "'--no-ablation', '--limit-frames', '8']))"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = _evaluate_dir(out)
    for k in KEYS:
        assert abs(got[k] - EXPECTED["ucmctrack"][k]) < 0.1, (
            f"ucmctrack {k}: f64 {got[k]:.3f} vs f32 "
            f"{EXPECTED['ucmctrack'][k]:.3f}"
        )
