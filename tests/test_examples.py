"""Examples must stay runnable — they are user-facing documentation
(the TPU analogue of the reference's README quick-start / tutorials)."""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = ROOT / "examples"


def _run(script, *args):
    return subprocess.run(
        [sys.executable, str(EXAMPLES / script), "--cpu", *args],
        capture_output=True, text=True, timeout=600, cwd=ROOT,
    )


def test_basic_tracking():
    r = _run("basic_tracking.py")
    assert r.returncode == 0, r.stderr
    assert "frame 10: 3 tracks" in r.stdout, r.stdout


def test_multistream():
    r = _run("multistream_tpu.py", "--streams", "8", "--frames", "5")
    assert r.returncode == 0, r.stderr
    assert "8 streams x 5 frames" in r.stdout, r.stdout
    assert "track emissions" in r.stdout


def test_functional_core():
    r = _run("functional_core.py")
    assert r.returncode == 0, r.stderr
    assert "scanned clip" in r.stdout, r.stdout


def test_async_serving():
    r = _run("async_serving.py", "--streams", "4", "--ticks", "6")
    assert r.returncode == 0, r.stderr
    assert "async serving ok" in r.stdout, r.stdout
    assert "streams present" in r.stdout


def test_moving_camera():
    r = _run("moving_camera.py", "--streams", "2", "--ticks", "5")
    assert r.returncode == 0, r.stderr
    assert "moving camera ok: STABLE" in r.stdout, r.stdout
    assert "estimated pans" in r.stdout


def test_unknown_tracker_message():
    r = _run("basic_tracking.py", "--tracker", "nope")
    assert r.returncode != 0
    assert "Unknown tracker" in r.stderr and "bytetrack" in r.stderr


def test_stream_rebalance():
    r = _run("stream_rebalance.py", "--frames", "10", "--move-at", "5")
    assert r.returncode == 0, r.stderr
    assert "camera moved host A -> host B" in r.stdout, r.stdout
    assert "bit-exact vs unmigrated run" in r.stdout
