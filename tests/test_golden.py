"""Golden-output regression: tracker results on MOT17-mini must stay
byte-identical to the checked-in files (regenerate intentionally with
scripts/regen_golden.py)."""

from pathlib import Path

import pytest

MOT_MINI = Path("/root/reference/assets/MOT17-mini/train")
GOLDEN = Path(__file__).resolve().parent / "golden"

needs_assets = pytest.mark.skipif(
    not MOT_MINI.exists(), reason="MOT17-mini assets not available"
)

TRACKERS = sorted(
    p.name for p in GOLDEN.iterdir() if p.is_dir()
) if GOLDEN.exists() else []


@needs_assets
@pytest.mark.parametrize("tracker", TRACKERS)
def test_golden_outputs(tracker, tmp_path):
    from motcpp_tpu.cli import main as cli_main

    out = tmp_path / tracker
    rc = cli_main(
        [str(MOT_MINI), str(out), tracker,
         "--max-dets", "128", "--max-tracks", "128", "--cpu"]
    )
    assert rc == 0
    golden_dir = GOLDEN / tracker
    golden_files = sorted(golden_dir.glob("*.txt"))
    assert golden_files, f"no goldens for {tracker}"
    for gf in golden_files:
        nf = out / gf.name
        assert nf.exists(), nf
        assert nf.read_text() == gf.read_text(), (
            f"{tracker}/{gf.name} diverged from golden — if intentional, "
            "run scripts/regen_golden.py"
        )
