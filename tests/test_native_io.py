"""Native IO runtime tests: parser/writer equivalence with Python paths."""

import numpy as np
import pytest

from motcpp_tpu.utils import native_io

needs_native = pytest.mark.skipif(
    not native_io.available(), reason="native toolchain unavailable"
)


@needs_native
def test_parse_floats_basic(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("1,2,3.5\n# comment\n4 5 6\n\n7,8,9\n")
    arr = native_io.parse_floats(p)
    np.testing.assert_allclose(arr, [[1, 2, 3.5], [4, 5, 6], [7, 8, 9]])
    assert arr.dtype == np.float32


@needs_native
def test_parse_detections_matches_python(tmp_path):
    from motcpp_tpu.data.mot17 import _parse_det_text

    comma = tmp_path / "c.txt"
    comma.write_text(
        "1,-1,10,20,40,80,0.9\n1,-1,50,60,10,10,0.5\n2,-1,0,0,5,5,0.3\n"
    )
    space = tmp_path / "s.txt"
    space.write_text("1 10 20 50 100 0.9 0\n3 1 2 3 4 0.5 1\n")
    for f in (comma, space):
        nat = native_io.parse_detections(f)
        py = _parse_det_text(f)
        assert len(nat) == len(py)
        for (fn, rn), (fp_, rp) in zip(nat, py):
            assert fn == fp_
            np.testing.assert_allclose(rn, rp, atol=1e-5)


@needs_native
def test_parse_malformed_lines_matches_python(tmp_path):
    """Trailing junk keeps the parsed prefix (ADVICE r1: native parser
    used to drop the whole row where the Python fallback kept it)."""
    from motcpp_tpu.data.mot17 import _parse_det_text

    f = tmp_path / "junk.txt"
    f.write_text(
        "1,-1,100,200,50,80,0.9,junk\n"  # trailing junk: keep prefix
        "2,-1,10,20,30,40,0.5\n"  # clean line
        "xyz\n"  # fully junk: dropped
        "3,-1,1,2,3,4,0.1,oops\n"  # junk in the optional cls column
    )
    nat = native_io.parse_detections(f)
    py = _parse_det_text(f)
    assert len(nat) == len(py) == 3
    for (fn, rn), (fp_, rp) in zip(nat, py):
        assert fn == fp_
        np.testing.assert_allclose(rn, rp, atol=1e-5)

    raw = native_io.parse_floats(f, max_cols=16)
    assert raw.shape[0] == 3
    np.testing.assert_allclose(raw[0][:7], [1, -1, 100, 200, 50, 80, 0.9])


@needs_native
def test_write_mot_matches_python_format(tmp_path):
    from motcpp_tpu.data.mot_format import convert_to_mot_format

    tracks = np.array([[10.6, 20.2, 50.9, 100.1, 7, 0.873, 0, 3]], np.float32)
    mot = convert_to_mot_format(tracks, 5)
    nat_file = tmp_path / "deep" / "nat.txt"
    assert native_io.write_mot(nat_file, mot)
    line = nat_file.read_text().strip()
    assert line == "5,7,10,20,40,79,0.873000,-1,-1,-1"


@needs_native
def test_embeddings_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    e = rng.random((20, 128)).astype(np.float32)
    f = tmp_path / "e.txt"
    np.savetxt(f, e, fmt="%.6f")
    arr = native_io.parse_embeddings(f)
    assert arr.shape == (20, 128)
    np.testing.assert_allclose(arr, e, atol=1e-5)


@needs_native
def test_native_speedup_on_large_file(tmp_path):
    import time

    rng = np.random.default_rng(1)
    e = rng.random((3000, 512)).astype(np.float32)
    f = tmp_path / "big.txt"
    np.savetxt(f, e, fmt="%.6f")
    t0 = time.time()
    arr = native_io.parse_embeddings(f)
    t_native = time.time() - t0
    t0 = time.time()
    ref = np.loadtxt(f, dtype=np.float32, ndmin=2)
    t_py = time.time() - t0
    np.testing.assert_allclose(arr, ref, atol=1e-5)
    # timing is informational only: wall-clock ratios flake under host
    # load (observed when the TPU bench shares the machine) — the
    # correctness check above is the contract
    print(f"native {t_native:.3f}s vs numpy {t_py:.3f}s")
