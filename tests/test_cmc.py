"""CMC estimator tests: ECC, SOF, and the TPU-native SOFJax/ECCJax."""

import numpy as np
import pytest

from motcpp_tpu.motion.cmc import ECC, ECCJax, SOF, SOFJax, create_cmc


def _textured(h=240, w=320, seed=0):
    """Smooth multi-scale noise that survives the estimators' heavy
    downscaling (the reference preprocesses at 0.15x)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for scale in (4, 8, 16, 32):
        small = rng.random((h // scale + 2, w // scale + 2)).astype(np.float32)
        up = np.kron(small, np.ones((scale, scale), np.float32))[:h, :w]
        img += up
    img = (img - img.min()) / (img.max() - img.min()) * 255
    img = img.astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


def _shift(img, dx, dy):
    out = np.zeros_like(img)
    h, w = img.shape[:2]
    out[max(0, dy):h + min(0, dy), max(0, dx):w + min(0, dx)] = img[
        max(0, -dy):h + min(0, -dy), max(0, -dx):w + min(0, -dx)
    ]
    return out


def test_factory():
    assert create_cmc("none") is None
    assert isinstance(create_cmc("ecc"), ECC)
    assert isinstance(create_cmc("sof"), SOF)
    assert isinstance(create_cmc("sof_jax"), SOFJax)
    assert isinstance(create_cmc("ecc_jax"), ECCJax)
    # prefer_jax keeps each method family on its TPU-native estimator
    assert isinstance(create_cmc("ecc", prefer_jax=True), ECCJax)
    assert isinstance(create_cmc("sof", prefer_jax=True), SOFJax)
    with pytest.raises(ValueError):
        create_cmc("bogus")


def test_first_frame_identity():
    for est in (ECC(), SOF(), SOFJax(), ECCJax()):
        w = est.apply(_textured())
        np.testing.assert_allclose(w, [[1, 0, 0], [0, 1, 0]], atol=1e-6)


@pytest.mark.parametrize("est_cls", [ECC, SOF])
def test_translation_recovered_cv(est_cls):
    cv2 = pytest.importorskip("cv2")
    est = est_cls()
    img = _textured()
    est.apply(img)
    shifted = _shift(img, 16, 8)
    w = est.apply(shifted)
    # translation should be recovered within a couple of pixels
    assert abs(w[0, 2] - 16) < 4.0, w
    assert abs(w[1, 2] - 8) < 4.0, w


def test_translation_recovered_jax():
    est = SOFJax(scale=0.5)
    img = _textured(seed=3)
    est.apply(img)
    shifted = _shift(img, 12, 6)
    w = est.apply(shifted)
    assert abs(w[0, 2] - 12) < 5.0, w
    assert abs(w[1, 2] - 6) < 5.0, w
    # rotation part ~ identity
    np.testing.assert_allclose(w[:, :2], np.eye(2), atol=0.05)


def test_static_scene_identityish():
    est = SOFJax(scale=0.5)
    img = _textured(seed=5)
    est.apply(img)
    w = est.apply(img)
    np.testing.assert_allclose(w[:, 2], 0.0, atol=1.5)
    np.testing.assert_allclose(w[:, :2], np.eye(2), atol=0.02)


def test_deepocsort_pan_following_via_cmc():
    """End-to-end: a camera pan with a static object — SOF warp keeps the
    identity stable even though the box jumps in image space."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from motcpp_tpu.models.deepocsort import DeepOCSort

    tr = DeepOCSort(
        min_hits=1, embedding_off=True, cmc_off=False,
        max_tracks=16, max_dets=8,
    )
    scene = _textured(480, 640, seed=7)
    ids = set()
    for t in range(6):
        pan = 25 * t
        img = _shift(scene, pan, 0)
        x = 100 + pan  # static object moves with the camera
        dets = np.array([[x, 120, x + 70, 320, 0.9, 0]], np.float32)
        out = tr.update(dets, img)
        for r in out:
            ids.add(int(r[4]))
    assert len(ids) == 1


def _rot_scale_frame(img, angle_deg, scale, cv2):
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, scale)
    return cv2.warpAffine(img, m, (w, h)), m


@pytest.mark.parametrize("est_cls,est_kw", [(SOF, {}), (SOFJax, dict(scale=0.5))])
def test_rotation_scale_recovered(est_cls, est_kw):
    """The partial-affine components (not just translation) must be
    recovered: warp a textured frame by 2 deg + 3% scale and compare the
    estimated 2x2 block against the ground-truth matrix (VERDICT r1 #8:
    rotation/scale were previously asserted ~identity, never exercised)."""
    cv2 = pytest.importorskip("cv2")
    cv2.setRNGSeed(0)
    img = _textured(320, 400, seed=11)
    warped, m_true = _rot_scale_frame(img, angle_deg=2.0, scale=1.03, cv2=cv2)
    est = est_cls(**est_kw)
    est.apply(img)
    w = est.apply(warped)
    np.testing.assert_allclose(w[:, :2], m_true[:, :2], atol=0.02)
    # scale = |column| of the 2x2 block
    s_est = float(np.linalg.norm(w[:, 0]))
    assert abs(s_est - 1.03) < 0.02, w
    # angle from the rotation part
    ang = np.degrees(np.arctan2(w[1, 0], w[0, 0]))
    assert abs(ang - (-2.0)) < 0.5 or abs(ang - 2.0) < 0.5, (ang, w)


def test_sof_subpixel_refinement_active():
    """cornerSubPix must actually move the detected corners off the
    integer grid (the refinement the reference applies at
    sof.cpp:47,105,165)."""
    cv2 = pytest.importorskip("cv2")
    gray = _textured(240, 320, seed=2)[:, :, 0]
    pts = SOF._detect(cv2, gray)
    assert pts is not None and len(pts) >= 20
    frac = np.abs(pts.reshape(-1, 2) - np.round(pts.reshape(-1, 2)))
    assert (frac > 1e-3).any(), "no corner moved sub-pixel"


def test_sof_jax_batch_recovers_per_stream_shifts():
    """Batched estimator: each stream's warp matches its own shift."""
    import jax.numpy as jnp

    from motcpp_tpu.motion.cmc import sof_jax_batch

    # shifts stay within the LK window (the SOFJax *wrapper* handles
    # larger motion by downscaling first; here we drive the raw core)
    shifts = [(7, 4), (-6, 3), (0, 0), (4, -7)]
    prevs, curs = [], []
    for s, (dx, dy) in enumerate(shifts):
        img = _textured(seed=10 + s)[:, :, 0].astype(np.float32)
        prevs.append(img)
        curs.append(_shift(img[..., None], dx, dy)[..., 0].astype(np.float32))
    warps, ok = sof_jax_batch(
        jnp.asarray(np.stack(prevs)), jnp.asarray(np.stack(curs))
    )
    warps = np.asarray(warps)
    assert np.asarray(ok).all()
    for s, (dx, dy) in enumerate(shifts):
        assert abs(warps[s, 0, 2] - dx) < 3.0, (s, warps[s])
        assert abs(warps[s, 1, 2] - dy) < 3.0, (s, warps[s])
        np.testing.assert_allclose(warps[s, :, :2], np.eye(2), atol=0.05)


def test_ecc_jax_translation_recovered():
    """The TPU-native ECC recovers sub-pixel translations, including
    shifts far outside the Gauss-Newton basin (the phase-correlation
    init; cv2's identity-init ECC fails there, ecc.cpp:83-90)."""
    import jax.numpy as jnp

    from motcpp_tpu.motion.cmc import _ecc_jax_core

    img = _textured()[:, :, 0].astype(np.float32)
    for dx, dy in [(16, 8), (-12, 5), (0, 0), (40, -25), (2, 3)]:
        shifted = _shift(img[..., None], dx, dy)[..., 0]
        w, ok = _ecc_jax_core(jnp.asarray(img), jnp.asarray(shifted))
        assert bool(ok), (dx, dy)
        assert abs(float(w[0, 2]) - dx) < 1.0, (dx, dy, np.asarray(w))
        assert abs(float(w[1, 2]) - dy) < 1.0, (dx, dy, np.asarray(w))


def test_ecc_jax_batch_recovers_per_stream_shifts():
    """Batched ECC: each stream's warp matches its own shift, failures
    (a flat frame) get identity + ok=False."""
    import jax.numpy as jnp

    from motcpp_tpu.motion.cmc import ecc_jax_batch

    shifts = [(7, 4), (-6, 3), (0, 0), (24, -11)]
    prevs, curs = [], []
    for s, (dx, dy) in enumerate(shifts):
        img = _textured(seed=10 + s)[:, :, 0].astype(np.float32)
        prevs.append(img)
        curs.append(_shift(img[..., None], dx, dy)[..., 0])
    # degenerate stream: flat frames have no signal to register
    prevs.append(np.full_like(prevs[0], 127.0))
    curs.append(np.full_like(prevs[0], 127.0))
    warps, ok = ecc_jax_batch(
        jnp.asarray(np.stack(prevs)), jnp.asarray(np.stack(curs))
    )
    warps = np.asarray(warps)
    ok = np.asarray(ok)
    for s, (dx, dy) in enumerate(shifts):
        assert ok[s], (s, warps[s])
        assert abs(warps[s, 0, 2] - dx) < 1.0, (s, warps[s])
        assert abs(warps[s, 1, 2] - dy) < 1.0, (s, warps[s])
    assert not ok[-1]
    np.testing.assert_allclose(warps[-1], [[1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_ecc_jax_batch_matches_single():
    """vmapped ECC core == per-pair core."""
    import jax.numpy as jnp

    from motcpp_tpu.motion.cmc import _ecc_jax_core, ecc_jax_batch

    prevs = np.stack(
        [_textured(seed=30 + s)[:, :, 0].astype(np.float32) for s in range(3)]
    )
    curs = np.stack(
        [_shift(_textured(seed=30 + s), 5, 3)[:, :, 0].astype(np.float32)
         for s in range(3)]
    )
    wb, okb = ecc_jax_batch(jnp.asarray(prevs), jnp.asarray(curs))
    for s in range(3):
        w1, ok1 = _ecc_jax_core(jnp.asarray(prevs[s]), jnp.asarray(curs[s]))
        np.testing.assert_allclose(np.asarray(wb)[s], np.asarray(w1),
                                   rtol=0, atol=1e-4)
        assert bool(np.asarray(okb)[s]) == bool(np.asarray(ok1))


def test_ecc_jax_parity_vs_cv2_on_pan_scene():
    """Parity pin: on the camera-pan golden scene (the same scene the
    golden_cmc regression runs), ECCJax's per-frame warp must agree
    with the cv2 findTransformECC port frame by frame — the TPU-native
    estimator is a drop-in for the reference's default CMC
    (ecc.cpp:22-98), not a different algorithm with similar outputs."""
    pytest.importorskip("cv2")
    from motcpp_tpu.data.synthetic import camera_pan_scene

    frames, _, _ = camera_pan_scene(n_frames=10)
    ref = ECC()
    jx = ECCJax()
    max_dt = 0.0
    for t, img in enumerate(frames):
        w_ref = ref.apply(img)
        w_jax = jx.apply(img)
        if t == 0:
            continue
        # both are translation-only models at 0.15x scale; full-scale
        # translation must agree within ~1px (one small-scale sixth px)
        dt = float(np.abs(w_ref[:, 2] - w_jax[:, 2]).max())
        max_dt = max(max_dt, dt)
        np.testing.assert_allclose(w_jax[:, :2], np.eye(2), atol=1e-6)
    assert max_dt < 1.5, max_dt


def test_sof_jax_batch_matches_single():
    """vmapped core == per-pair core."""
    import jax.numpy as jnp

    from motcpp_tpu.motion.cmc import _sof_jax_core, sof_jax_batch

    prevs = np.stack(
        [_textured(seed=20 + s)[:, :, 0].astype(np.float32) for s in range(3)]
    )
    curs = np.stack(
        [_shift(_textured(seed=20 + s), 5, 3)[:, :, 0].astype(np.float32)
         for s in range(3)]
    )
    wb, okb = sof_jax_batch(jnp.asarray(prevs), jnp.asarray(curs))
    for s in range(3):
        w1, ok1 = _sof_jax_core(jnp.asarray(prevs[s]), jnp.asarray(curs[s]))
        np.testing.assert_allclose(np.asarray(wb)[s], np.asarray(w1),
                                   rtol=0, atol=1e-4)
        assert bool(np.asarray(okb)[s]) == bool(np.asarray(ok1))
