"""Data/config/CLI layer tests, using the reference's bundled
MOT17-mini assets as read-only fixtures when present."""

import os
from pathlib import Path

import numpy as np
import pytest

from motcpp_tpu.config import TrackerConfig, load_tracker_config
from motcpp_tpu.data import (
    MOT17Dataset,
    convert_to_mot_format,
    write_mot_results,
)

MOT_MINI = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"
needs_assets = pytest.mark.skipif(
    not MOT_MINI.exists(), reason="MOT17-mini assets not available"
)


def test_convert_to_mot_format():
    tracks = np.array(
        [[10.0, 20.0, 50.0, 100.0, 7.0, 0.9, 0.0, 3.0]], np.float32
    )
    mot = convert_to_mot_format(tracks, 5)
    assert mot.shape == (1, 10)
    np.testing.assert_allclose(
        mot[0], [5, 7, 10, 20, 40, 80, 0.9, -1, -1, -1], atol=1e-5
    )
    assert convert_to_mot_format(np.zeros((0, 8)), 1).shape == (0, 10)


def test_write_mot_results_appends(tmp_path):
    out = tmp_path / "a" / "seq.txt"
    tracks = np.array([[10, 20, 50, 100, 7, 0.9, 0, 3]], np.float32)
    write_mot_results(out, convert_to_mot_format(tracks, 1))
    write_mot_results(out, convert_to_mot_format(tracks, 2))
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "1,7,10,20,40,80,0.900000,-1,-1,-1"
    assert lines[1].startswith("2,7,")


def test_det_parsing_both_formats(tmp_path):
    comma = tmp_path / "comma.txt"
    comma.write_text("1,-1,10,20,40,80,0.9\n1,-1,50,60,10,10,0.5\n2,-1,0,0,5,5,0.3\n")
    dets = MOT17Dataset.load_detections(comma)
    assert set(dets) == {1, 2}
    assert dets[1].shape == (2, 6)
    np.testing.assert_allclose(dets[1][0], [10, 20, 50, 100, 0.9, 0], atol=1e-5)

    space = tmp_path / "space.txt"
    space.write_text("1 10 20 50 100 0.9 0\n3 1 2 3 4 0.5 1\n")
    dets = MOT17Dataset.load_detections(space)
    assert set(dets) == {1, 3}
    np.testing.assert_allclose(dets[3][0], [1, 2, 3, 4, 0.5, 1], atol=1e-5)


def test_embedding_alignment(tmp_path):
    det_file = tmp_path / "d.txt"
    det_file.write_text("1,-1,0,0,10,10,0.9\n1,-1,5,5,10,10,0.8\n2,-1,0,0,10,10,0.7\n")
    dets = MOT17Dataset.load_detections(det_file)
    emb_file = tmp_path / "e.txt"
    emb_file.write_text("1 0 0\n0 1 0\n0 0 1\n")
    embs = MOT17Dataset.load_embeddings(emb_file, dets)
    assert embs[1].shape == (2, 3)
    assert embs[2].shape == (1, 3)
    np.testing.assert_allclose(embs[2][0], [0, 0, 1])


def test_config_flat_and_tune_styles(tmp_path):
    y = tmp_path / "t.yaml"
    y.write_text(
        "det_thresh: 0.25\nuse_byte: true\nasso_func: giou\n"
        "match_thresh:\n  type: uniform\n  default: 0.9\n  range: [0.7, 0.9]\n"
        "track_buffer:\n  type: randint\n  default: 30\n  range: [10, 61, 10]\n"
    )
    cfg = load_tracker_config(y)
    assert cfg.get_float("det_thresh") == pytest.approx(0.25)
    assert cfg.get_bool("use_byte") is True
    assert cfg.get_string("asso_func") == "giou"
    assert cfg.get_float("match_thresh") == pytest.approx(0.9)
    assert cfg.get_int("track_buffer") == 30
    assert cfg.search_space["match_thresh"]["type"] == "uniform"


def test_shipped_configs_load():
    for name in (
        "sort", "bytetrack", "ocsort", "deepocsort", "strongsort",
        "botsort", "boosttrack", "hybridsort", "ucmctrack",
    ):
        cfg = load_tracker_config(name)
        assert isinstance(cfg, TrackerConfig)
    with pytest.raises(FileNotFoundError):
        load_tracker_config("nonexistent_tracker")


@needs_assets
def test_mot17_mini_indexing():
    ds = MOT17Dataset(MOT_MINI)
    names = ds.sequence_names()
    assert "MOT17-02-FRCNN" in names and "MOT17-04-FRCNN" in names
    seq = ds.get_sequence_info("MOT17-02-FRCNN")
    assert seq.fps == 30
    assert len(seq.frame_ids) > 0
    dets = ds.load_detections(seq.det_path)
    assert len(dets) > 0
    n, c = next(iter(dets.values())).shape
    assert c == 6


@needs_assets
def test_cli_end_to_end_mot_mini(tmp_path):
    from motcpp_tpu.cli import main

    rc = main(
        [
            str(MOT_MINI),
            str(tmp_path / "results"),
            "sort",
            "--max-dets", "128",
            "--max-tracks", "128",
            "--cpu",
        ]
    )
    assert rc == 0
    outs = list((tmp_path / "results").glob("*.txt"))
    assert len(outs) == 2
    for f in outs:
        rows = [l.split(",") for l in f.read_text().strip().split("\n") if l]
        assert all(len(r) == 10 for r in rows)
        frames = sorted({int(r[0]) for r in rows})
        assert frames[0] >= 1
        ids = {int(r[1]) for r in rows}
        assert len(ids) > 1  # multiple pedestrians tracked


def test_every_shipped_yaml_constructs_its_tracker():
    """configs/trackers/<name>.yaml kwargs must be accepted verbatim by
    create_tracker (the reference eval builds trackers from these
    files, src/config.cpp:76-80 + tools/motcpp_eval.cpp)."""
    import numpy as np

    import motcpp_tpu

    img = np.zeros((480, 640, 3), np.uint8)
    d = np.array([[100, 100, 200, 300, 0.9, 0]], np.float32)
    names = ["sort", "bytetrack", "ocsort", "deepocsort", "strongsort",
             "botsort", "boosttrack", "hybridsort", "ucmctrack"]
    for name in names:
        kw = load_tracker_config(name).as_kwargs()
        tr = motcpp_tpu.create_tracker(name, max_tracks=16, max_dets=8, **kw)
        out = tr.update(d, img)
        assert out.shape[1] == 8, name


def test_search_space_sampling_semantics():
    """TrackerConfig.sample: uniform in range, randint honors step,
    choice from list, deterministic under a seeded rng, non-search
    params pass through."""
    from motcpp_tpu.config import TrackerConfig

    cfg = TrackerConfig(
        params={"a": 0.5, "b": 30, "c": "x", "fixed": 7},
        search_space={
            "a": {"type": "uniform", "range": [0.1, 0.3]},
            "b": {"type": "randint", "range": [10, 61, 10]},
            "c": {"type": "choice", "range": ["x", "y", "z"]},
        },
    )
    rng = np.random.default_rng(0)
    seen_b = set()
    for _ in range(50):
        s = cfg.sample(rng)
        assert 0.1 <= s["a"] <= 0.3
        assert s["b"] in {10, 20, 30, 40, 50, 60}
        assert s["c"] in ("x", "y", "z")
        assert s["fixed"] == 7
        seen_b.add(s["b"])
    assert len(seen_b) > 2  # actually explores
    # deterministic under the same seed
    s1 = cfg.sample(np.random.default_rng(42))
    s2 = cfg.sample(np.random.default_rng(42))
    assert s1 == s2
    # unknown node type raises
    bad = TrackerConfig(params={}, search_space={"k": {"type": "loguniform",
                                                       "range": [1, 2]}})
    with pytest.raises(ValueError):
        bad.sample(rng)


def test_yaml_search_spaces_sampleable():
    """Every shipped YAML's search space must sample into kwargs its
    tracker accepts (ties the schema to the tuner end to end)."""
    import motcpp_tpu
    from motcpp_tpu.config import CONFIG_DIR, load_tracker_config

    rng = np.random.default_rng(1)
    for yaml_path in sorted(CONFIG_DIR.glob("*.yaml")):
        cfg = load_tracker_config(yaml_path)
        params = cfg.sample(rng)
        tracker = motcpp_tpu.create_tracker(
            yaml_path.stem, max_dets=8, max_tracks=8, **params
        )
        assert tracker is not None


def test_mot20_layout_indexing(tmp_path):
    """MOT20-style sequence dirs (no detector suffix in the name) index
    through the same dataset class — the reference advertises MOT17/
    MOT20 support and both use the identical MOT-Challenge layout."""
    seq = tmp_path / "train" / "MOT20-01"
    (seq / "img1").mkdir(parents=True)
    (seq / "det").mkdir()
    (seq / "img1" / "000001.jpg").write_bytes(b"")
    (seq / "img1" / "000002.jpg").write_bytes(b"")
    (seq / "det" / "det.txt").write_text(
        "1,-1,10,20,40,80,0.9\n2,-1,12,22,40,80,0.8\n")
    (seq / "seqinfo.ini").write_text(
        "[Sequence]\nname=MOT20-01\nframeRate=25\nseqLength=2\n")
    ds = MOT17Dataset(tmp_path / "train")
    assert ds.sequence_names() == ["MOT20-01"]
    info = ds.get_sequence_info("MOT20-01")
    assert info.fps == 25
    dets = ds.load_detections(info.det_path)
    assert set(dets) == {1, 2}
    # external det root: falls back to "<seq_name>.txt" (no detector
    # suffix to strip)
    ext = tmp_path / "ext" / "dets"
    ext.mkdir(parents=True)
    (ext / "MOT20-01.txt").write_text("1,-1,1,1,5,5,0.5\n")
    ds2 = MOT17Dataset(tmp_path / "train", det_emb_root=tmp_path / "ext",
                       model_name="yolox_x")
    info2 = ds2.get_sequence_info("MOT20-01")
    assert info2.det_path == ext / "MOT20-01.txt"
