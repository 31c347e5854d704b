"""Golden-output regression: tracker results on the bundled MOT17-mini
must stay byte-identical to the checked-in files (regenerate
intentionally with scripts/regen_golden.py).

Two sets: tests/golden (ablation window, 4+8 frames vs GT) and
tests/golden_long (--no-ablation, first 150 real det frames — pins
lost-track aging, max_age deaths, duplicate removal and OCR long-gap
paths that the short window never reaches; VERDICT r1 #3)."""

from pathlib import Path

import pytest

MOT_MINI = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"
GOLDEN = Path(__file__).resolve().parent / "golden"
GOLDEN_LONG = Path(__file__).resolve().parent / "golden_long"

needs_assets = pytest.mark.skipif(
    not MOT_MINI.exists(), reason="MOT17-mini assets not available"
)

TRACKERS = sorted(
    p.name for p in GOLDEN.iterdir() if p.is_dir()
) if GOLDEN.exists() else []
TRACKERS_LONG = sorted(
    p.name for p in GOLDEN_LONG.iterdir() if p.is_dir()
) if GOLDEN_LONG.exists() else []


def _check(tracker, golden_dir, out, extra_args=()):
    from motcpp_tpu.cli import main as cli_main

    rc = cli_main(
        [str(MOT_MINI), str(out), tracker,
         "--max-dets", "128", "--max-tracks", "128", "--cpu", *extra_args]
    )
    assert rc == 0
    golden_files = sorted(golden_dir.glob("*.txt"))
    assert golden_files, f"no goldens for {tracker}"
    for gf in golden_files:
        nf = out / gf.name
        assert nf.exists(), nf
        assert nf.read_text() == gf.read_text(), (
            f"{tracker}/{gf.name} diverged from golden — if intentional, "
            "run scripts/regen_golden.py"
        )


@needs_assets
@pytest.mark.parametrize("tracker", TRACKERS)
def test_golden_outputs(tracker, tmp_path):
    _check(tracker, GOLDEN / tracker, tmp_path / tracker)


@needs_assets
@pytest.mark.parametrize("tracker", TRACKERS_LONG)
def test_golden_long_horizon(tracker, tmp_path):
    _check(
        tracker,
        GOLDEN_LONG / tracker,
        tmp_path / tracker,
        extra_args=("--no-ablation", "--limit-frames", "150"),
    )
