"""Appearance layer tests: crop pipeline, OSNet forward, backend contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.appearance.reid import (
    ReIDBackend,
    determine_input_shape,
    determine_normalization,
    extract_crops,
)


def test_input_shape_heuristics():
    # reference: reid_backend.cpp:88-105
    assert determine_input_shape("osnet_x1_0_dukemtmcreid") == (256, 128)
    assert determine_input_shape("resnet50_vehicleid") == (256, 256)
    assert determine_input_shape("model_veri776") == (256, 256)
    assert determine_input_shape("lmbn_n_cuhk03") == (384, 128)
    assert determine_input_shape("hacnn_market") == (160, 64)
    assert determine_input_shape("") == (256, 128)


def test_normalization_heuristics():
    m, s = determine_normalization("clip_market1501")
    assert m == (0.5, 0.5, 0.5) and s == (0.5, 0.5, 0.5)
    m, s = determine_normalization("osnet_x1_0")
    assert m == (0.485, 0.456, 0.406)


def test_extract_crops_solid_color():
    """A solid-color crop region must produce the exact normalized value
    everywhere (validates clamp + BGR->RGB + normalize)."""
    import jax.numpy as jnp

    img = np.zeros((100, 200, 3), np.uint8)
    img[20:60, 30:90] = (255, 0, 0)  # pure BLUE in BGR
    boxes = jnp.asarray([[30.0, 20.0, 90.0, 60.0]])
    crops = np.asarray(
        extract_crops(jnp.asarray(img), boxes, (32, 16),
                      ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)))
    )
    assert crops.shape == (1, 32, 16, 3)
    # RGB: R=0, G=0, B=1 after BGR->RGB
    np.testing.assert_allclose(crops[0, 16, 8, 2], (1.0 - 0.406) / 0.225, atol=1e-3)
    np.testing.assert_allclose(crops[0, 16, 8, 0], (0.0 - 0.485) / 0.229, atol=1e-3)


def test_extract_crops_out_of_bounds_clamped():
    import jax.numpy as jnp

    img = np.full((50, 50, 3), 128, np.uint8)
    boxes = jnp.asarray([[-20.0, -20.0, 70.0, 70.0], [40.0, 40.0, 60.0, 60.0]])
    crops = np.asarray(
        extract_crops(jnp.asarray(img), boxes, (16, 8),
                      ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))
    )
    assert np.all(np.isfinite(crops))
    np.testing.assert_allclose(crops, 128 / 255.0, atol=1e-3)


def test_backend_get_features_contract():
    be = ReIDBackend(model_name="osnet_x1_0_test")
    img = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.asarray(
        [[10, 10, 60, 150], [100, 30, 160, 200]], np.float32
    )
    feats = be.get_features(boxes, img)
    assert feats.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=1), 1.0, atol=1e-4
    )
    # deterministic
    feats2 = be.get_features(boxes, img)
    np.testing.assert_allclose(feats, feats2, atol=1e-6)
    # empty input
    assert be.get_features(np.zeros((0, 4), np.float32), img).shape == (0, 512)


def test_backend_get_crops_chw_contract():
    be = ReIDBackend(model_name="hacnn_tiny")  # 160x64 input
    img = np.zeros((100, 100, 3), np.uint8)
    out = be.get_crops(np.asarray([[0, 0, 50, 100]], np.float32), img)
    assert out.shape == (1, 3 * 160 * 64)


def test_osnet_feature_discrimination():
    """Different crops produce different embeddings; identical crops
    produce identical ones (even with random init)."""
    be = ReIDBackend()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (200, 300, 3), np.uint8)
    boxes = np.asarray(
        [[0, 0, 60, 180], [0, 0, 60, 180], [200, 20, 280, 190]], np.float32
    )
    f = be.get_features(boxes, img)
    np.testing.assert_allclose(f[0], f[1], atol=1e-5)
    assert np.linalg.norm(f[0] - f[2]) > 1e-3


# --------------------------------------------------------- torch parity
class TestTorchParity:
    """The pretrained-weight path: a torchreid-layout state_dict must map
    deterministically onto the Flax tree (params + batch_stats) and
    reproduce the torch forward numerics (VERDICT r1 #1)."""

    @pytest.fixture(scope="class")
    def torch_and_flax(self):
        torch = pytest.importorskip("torch")
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import torch_osnet

        from motcpp_tpu.appearance.osnet import (
            init_params,
            load_torch_weights,
            osnet_x0_25,
        )

        tmodel = torch_osnet.osnet_x0_25()
        torch_osnet.randomize_(tmodel, seed=3)
        tmodel.eval()

        fmodel = osnet_x0_25()
        variables = init_params(fmodel, (256, 128))

        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".pt") as f:
            torch.save(tmodel.state_dict(), f.name)
            variables = load_torch_weights(fmodel, variables, f.name)
        return tmodel, fmodel, variables

    def test_forward_parity(self, torch_and_flax):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        tmodel, fmodel, variables = torch_and_flax
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (2, 3, 256, 128)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x)).numpy()
        out = np.asarray(
            fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)
        )
        assert ref.shape == out.shape == (2, 512)
        # raw features: f32 accumulation-order drift scales with
        # activation magnitude (the variance-preserving generator init
        # produces |ref| up to ~1.5e3; measured max rel ~6e-4)
        np.testing.assert_allclose(out, ref, atol=5e-3, rtol=2e-3)
        # the PRODUCT contract is L2-normalized embeddings — these must
        # agree to float32 precision
        rn = ref / np.linalg.norm(ref, axis=1, keepdims=True)
        on = out / np.linalg.norm(out, axis=1, keepdims=True)
        np.testing.assert_allclose(on, rn, atol=1e-5)

    def test_batch_stats_actually_loaded(self, torch_and_flax):
        """BN running stats must land in batch_stats (not stay at init
        mean=0/var=1 — the round-1 silent failure mode)."""
        _, _, variables = torch_and_flax
        bn = variables["batch_stats"]["conv1"]["bn"]
        assert float(np.abs(np.asarray(bn["mean"])).max()) > 1e-3
        assert abs(float(np.asarray(bn["var"]).mean()) - 1.0) > 1e-3

    def test_incompatible_checkpoint_raises(self, tmp_path):
        torch = pytest.importorskip("torch")
        from motcpp_tpu.appearance.osnet import (
            init_params,
            load_torch_weights,
            osnet_x0_25,
        )

        p = tmp_path / "bad.pt"
        torch.save({"conv1.conv.weight": torch.zeros(9, 3, 7, 7)}, p)
        model = osnet_x0_25()
        variables = init_params(model, (64, 32))
        with pytest.raises(ValueError, match="does not map"):
            load_torch_weights(model, variables, str(p))

    def test_npz_roundtrip_through_backend(self, torch_and_flax, tmp_path):
        """convert -> save .npz -> ReIDBackend load: embeddings identical
        to the direct apply (ADVICE r1: .npz path was silently ignored)."""
        import jax.numpy as jnp

        from motcpp_tpu.appearance.osnet import (
            load_npz_variables,
            save_npz_variables,
        )

        _, fmodel, variables = torch_and_flax
        p = tmp_path / "osnet_x0_25_test.npz"
        save_npz_variables(p, variables)
        loaded = load_npz_variables(p)
        x = jnp.ones((1, 256, 128, 3), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(fmodel.apply(variables, x, train=False)),
            np.asarray(fmodel.apply(loaded, x, train=False)),
        )

    def test_unknown_weights_suffix_raises(self, tmp_path):
        p = tmp_path / "w.onnx"
        p.write_bytes(b"\x00")
        with pytest.raises(ValueError, match="unrecognized"):
            ReIDBackend(weights=str(p))


def test_cli_live_reid_weights_path(tmp_path):
    """The eval CLI's 7th positional (reid_weights, matching the
    reference's tools/motcpp_eval.cpp:38) must run live on-device ReID
    when no pre-generated embeddings exist: convert a torchreid-layout
    checkpoint, run botsort over real frames, get tracks."""
    torch = pytest.importorskip("torch")
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root / "scripts"))
    import torch_osnet
    from convert_reid_weights import main as convert_main

    from motcpp_tpu.cli import main as cli_main

    ckpt = tmp_path / "osnet_x0_25_test.pt"
    npz = tmp_path / "osnet_x0_25_test.npz"
    model = torch_osnet.osnet_x0_25()
    torch_osnet.randomize_(model, seed=1)
    torch.save(model.state_dict(), ckpt)
    assert convert_main([str(ckpt), str(npz), "x0_25"]) == 0

    mot = root / "assets" / "MOT17-mini" / "train"
    if not mot.exists():
        pytest.skip("assets unavailable")
    out = tmp_path / "out"
    rc = cli_main(
        [str(mot), str(out), "botsort", "", "", "", str(npz),
         "--no-ablation", "--limit-frames", "2", "--images", "--cpu",
         "--max-dets", "64", "--max-tracks", "64"]
    )
    assert rc == 0
    files = sorted(out.glob("*.txt"))
    assert files, "live-ReID run emitted no tracks"
    first = files[0].read_text().strip().splitlines()
    assert len(first) > 5  # crowded MOT17 frames


def test_bfloat16_inference_agrees_with_f32():
    """compute_dtype='bfloat16' must produce embeddings whose cosine
    agreement with the f32 path is >= 0.995 (and stay L2-normalized
    float32 at the boundary)."""
    import numpy as np

    from motcpp_tpu.appearance.reid import ReIDBackend

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.asarray(
        [[10, 10, 100, 250], [300, 40, 420, 380], [50, 200, 160, 460]],
        np.float32,
    )
    f32 = ReIDBackend(seed=7)
    b16 = ReIDBackend(seed=7, compute_dtype="bfloat16")
    e32 = f32.get_features(boxes, img)
    e16 = b16.get_features(boxes, img)
    assert e16.dtype == np.float32
    np.testing.assert_allclose(
        np.linalg.norm(e16, axis=1), 1.0, atol=1e-3
    )
    cos = np.sum(e32 * e16, axis=1)
    assert (cos >= 0.995).all(), cos


def test_bad_compute_dtype_raises():
    import pytest as _pytest

    from motcpp_tpu.appearance.reid import ReIDBackend

    with _pytest.raises(ValueError):
        ReIDBackend(compute_dtype="fp16")


def test_depthwise_shift_matches_grouped_conv():
    """dw_impl='shift' (DepthwiseShift3x3 stencil) must share the exact
    parameter tree of the grouped-conv model (converted checkpoints map
    unchanged) and reproduce its forward numerics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motcpp_tpu.appearance.osnet import init_params, osnet_x0_25

    m_conv = osnet_x0_25()
    m_shift = osnet_x0_25(dw_impl="shift")
    v = init_params(m_conv, (64, 32), seed=0)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        init_params(m_shift, (64, 32), seed=0)
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 64, 32, 3)).astype(np.float32)
    )
    y_conv = m_conv.apply(v, x, train=False)
    y_shift = m_shift.apply(v, x, train=False)  # same variables v
    np.testing.assert_allclose(
        np.asarray(y_conv), np.asarray(y_shift), atol=1e-4, rtol=1e-4
    )


def test_fused_osblock_forward_matches_folded():
    """The fused-OSBlock Pallas forward (appearance/osblock_pallas.py,
    the TPU hot path behind live ReID) must reproduce the folded f32
    reference forward exactly-ish, and make_embed_fn(fused=True) must
    pad ragged batches to the stage-tile lcm and slice back. Runs the
    Pallas interpreter on CPU; the TPU A/B lives in
    scripts/profile_osnet.py --fused."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motcpp_tpu.appearance.osblock_pallas import forward_fused
    from motcpp_tpu.appearance.osnet import init_params, osnet_x0_25
    from motcpp_tpu.appearance.quant import fold_osnet, forward_folded_f32
    from motcpp_tpu.appearance.reid import make_embed_fn

    model = osnet_x0_25()
    vs = init_params(model, input_hw=(32, 16), seed=0)
    folded = fold_osnet(jax.device_get(vs))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 16, 3)), jnp.float32)
    ref = np.asarray(forward_folded_f32(folded, x))
    got = np.asarray(forward_fused(
        folded, x, tiles={"conv2": 2, "conv3": 2, "conv4": 2},
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    # embed-fn integration: ragged batch (5 crops) pads to the tile lcm
    crops = rng.integers(0, 255, (5, 32, 16, 3)).astype(np.uint8)
    e_fused = make_embed_fn(model, vs, fused=True)(jnp.asarray(crops))
    e_folded = make_embed_fn(model, vs, folded=True)(jnp.asarray(crops))
    e_fused, e_folded = np.asarray(e_fused), np.asarray(e_folded)
    assert e_fused.shape == e_folded.shape == (5, 512)
    cos = (e_fused * e_folded).sum(1)  # both L2-normalized
    assert cos.min() >= 0.999, cos


def test_reid_backend_dw_impl_shift():
    """ReIDBackend(dw_impl='shift') must load checkpoints unchanged
    (clone keeps the param tree) and agree with the grouped-conv
    schedule; bad values raise."""
    import numpy as np
    import pytest as _pytest

    from motcpp_tpu.appearance.reid import ReIDBackend

    w = "tests/fixtures/osnet_x0_25_converted.npz"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.asarray([[10, 10, 100, 230]], np.float32)
    a = ReIDBackend(weights=w)
    b = ReIDBackend(weights=w, dw_impl="shift")
    cos = float(np.sum(a.get_features(boxes, img) * b.get_features(boxes, img)))
    assert cos >= 0.999, cos
    with _pytest.raises(ValueError):
        ReIDBackend(dw_impl="fast")


class TestQuantizedInference:
    """Int8 quantized OSNet (appearance/quant.py, VERDICT r3 #1b).

    The reference's ReID inference is float32 ONNX-Runtime
    (onnx_backend.cpp:159-223); the TPU throughput path folds BN and
    runs the pointwise/stem convs int8 on the MXU. Three pins:
    structure (manual folded f32 forward == flax apply), quality (int8
    cosine vs f32 >= 0.995, the same bar as the bf16 pin), and
    drop-in contract (make_embed_fn_int8 matches make_embed_fn's
    preprocessing and normalization).
    """

    @pytest.fixture(scope="class")
    def setup(self):
        from motcpp_tpu.appearance.osnet import init_params, osnet_x0_25

        model = osnet_x0_25(feature_dim=64)
        hw = (64, 32)
        variables = init_params(model, hw, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (4,) + hw + (3,)), jnp.float32)
        return model, variables, x, hw

    def test_folded_f32_matches_flax(self, setup):
        from motcpp_tpu.appearance.quant import (
            fold_osnet,
            forward_folded_f32,
        )

        model, variables, x, _ = setup
        ref = model.apply(variables, x, train=False)
        man = forward_folded_f32(fold_osnet(variables), x)
        np.testing.assert_allclose(
            np.asarray(man), np.asarray(ref), atol=1e-4
        )

    def test_int8_cosine_agreement(self, setup):
        from motcpp_tpu.appearance.quant import forward_int8, quantize_osnet

        model, variables, x, _ = setup
        ref = np.asarray(model.apply(variables, x, train=False))
        q = np.asarray(forward_int8(
            quantize_osnet(model, variables, calib_crops=x), x
        ))
        rn = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-9)
        qn = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-9)
        cos = (rn * qn).sum(-1)
        assert (cos >= 0.995).all(), cos

    def test_embed_fn_int8_drop_in(self, setup):
        """Same uint8-BGR-crops contract as make_embed_fn; embeddings
        L2-normalized and cosine-close to the f32 embed_fn."""
        from motcpp_tpu.appearance.quant import make_embed_fn_int8
        from motcpp_tpu.appearance.reid import make_embed_fn

        model, variables, _, hw = setup
        rng = np.random.default_rng(1)
        crops = jnp.asarray(
            rng.integers(0, 255, (6,) + hw + (3,)), jnp.uint8
        )
        e_f = np.asarray(jax.jit(make_embed_fn(model, variables))(crops))
        e_q = np.asarray(jax.jit(make_embed_fn_int8(model, variables))(crops))
        np.testing.assert_allclose(
            np.linalg.norm(e_q, axis=-1), 1.0, atol=1e-4
        )
        cos = (e_f * e_q).sum(-1)
        assert (cos >= 0.995).all(), cos
