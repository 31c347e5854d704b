"""Kalman filter tests (model: reference tests/test_kalman_filter.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.ops import boxes
from motcpp_tpu.ops.kalman import (
    XYSRParams,
    kf_xyah,
    kf_xywh,
    xysr_init,
    xysr_predict,
    xysr_update,
)
from motcpp_tpu.ops.kalman.xysr import xysr_apply_affine


# ---------------------------------------------------------------- XYSR ----


def test_xysr_shapes_and_init():
    z = boxes.xyxy2xysr(jnp.asarray([10.0, 20.0, 50.0, 100.0]))
    x, P = xysr_init(z)
    assert x.shape == (7,) and P.shape == (7, 7)
    np.testing.assert_allclose(x[:4], z, atol=1e-5)
    np.testing.assert_allclose(x[4:], 0.0)
    # P0: 10*I with velocity block x100 (reference: xysr_kf.cpp:52-55)
    np.testing.assert_allclose(np.diag(P)[:4], 10.0)
    np.testing.assert_allclose(np.diag(P)[4:], 1000.0)


def test_xysr_predict_moves_by_velocity():
    # reference: test_kalman_filter.cpp:34-44
    z = jnp.asarray([100.0, 100.0, 400.0, 1.0])
    x, P = xysr_init(z)
    x = x.at[4].set(5.0).at[5].set(-3.0)
    x2, P2 = xysr_predict(x, P)
    assert float(x2[0]) == pytest.approx(105.0)
    assert float(x2[1]) == pytest.approx(97.0)
    assert float(x2[3]) == pytest.approx(1.0)  # r static
    # covariance grows
    assert float(P2[0, 0]) > float(P[0, 0])


def test_xysr_update_pulls_toward_measurement():
    # reference: test_kalman_filter.cpp:46-57
    z0 = jnp.asarray([100.0, 100.0, 400.0, 1.0])
    x, P = xysr_init(z0)
    x, P = xysr_predict(x, P)
    z1 = jnp.asarray([110.0, 105.0, 420.0, 1.0])
    x2, P2 = xysr_update(x, P, z1)
    # state moves toward measurement, bounded by it
    assert float(x[0]) < float(x2[0]) <= 110.0
    assert float(x[1]) < float(x2[1]) <= 105.0
    # uncertainty shrinks
    assert float(P2[0, 0]) < float(P[0, 0])


def test_xysr_update_is_symmetric_psd():
    z = jnp.asarray([50.0, 60.0, 900.0, 0.8])
    x, P = xysr_init(z)
    for _ in range(5):
        x, P = xysr_predict(x, P)
        x, P = xysr_update(x, P, z + 1.0)
    P = np.asarray(P)
    np.testing.assert_allclose(P, P.T, atol=1e-3)
    assert np.all(np.linalg.eigvalsh(P) > -1e-3)


def test_xysr_affine_correction_translates():
    # reference: test_kalman_filter.cpp:72-84
    z = jnp.asarray([100.0, 100.0, 400.0, 1.0])
    x, P = xysr_init(z)
    m = jnp.eye(2)
    t = jnp.asarray([7.0, -2.0])
    x2, P2 = xysr_apply_affine(x, P, m, t)
    assert float(x2[0]) == pytest.approx(107.0)
    assert float(x2[1]) == pytest.approx(98.0)
    np.testing.assert_allclose(P2, P, atol=1e-5)  # identity rotation


def test_xysr_batched_over_slots():
    z = jnp.broadcast_to(jnp.asarray([10.0, 10.0, 100.0, 1.0]), (16, 4))
    x, P = xysr_init(z)
    assert x.shape == (16, 7) and P.shape == (16, 7, 7)
    x, P = xysr_predict(x, P, XYSRParams(q_xy_scaling=0.01, q_s_scaling=0.0001))
    x, P = xysr_update(x, P, z)
    assert np.all(np.isfinite(np.asarray(x)))


# ------------------------------------------------------------- Gaussian ---


def test_xyah_initiate_values():
    meas = jnp.asarray([30.0, 60.0, 0.5, 80.0])
    mean, cov = kf_xyah.initiate(meas)
    assert mean.shape == (8,) and cov.shape == (8, 8)
    np.testing.assert_allclose(mean[:4], meas, atol=1e-6)
    # std[0] = 2 * (1/20) * h = 8 -> var 64 (reference: xyah_kf.cpp:19)
    assert float(cov[0, 0]) == pytest.approx(64.0)
    # aspect var = (1e-2)^2
    assert float(cov[2, 2]) == pytest.approx(1e-4)


def test_xyah_predict_update_cycle():
    meas = jnp.asarray([30.0, 60.0, 0.5, 80.0])
    mean, cov = kf_xyah.initiate(meas)
    mean = mean.at[4].set(2.0)
    mean2, cov2 = kf_xyah.predict(mean, cov)
    assert float(mean2[0]) == pytest.approx(32.0)
    z = jnp.asarray([33.0, 61.0, 0.5, 82.0])
    mean3, cov3 = kf_xyah.update(mean2, cov2, z)
    assert float(mean2[0]) < float(mean3[0]) <= 33.0
    assert float(cov3[0, 0]) < float(cov2[0, 0])


def test_xyah_nsa_confidence_shrinks_noise():
    """NSA: higher confidence -> smaller R -> stronger pull to measurement
    (reference: kalman_filter.cpp:66-68)."""
    meas = jnp.asarray([30.0, 60.0, 0.5, 80.0])
    mean, cov = kf_xyah.initiate(meas)
    mean, cov = kf_xyah.predict(mean, cov)
    z = jnp.asarray([40.0, 60.0, 0.5, 80.0])
    m_low, _ = kf_xyah.update(mean, cov, z, nsa_conf=0.1)
    m_high, _ = kf_xyah.update(mean, cov, z, nsa_conf=0.9)
    assert abs(float(m_high[0]) - 40.0) < abs(float(m_low[0]) - 40.0)


def test_xyah_gating_distance():
    meas = jnp.asarray([30.0, 60.0, 0.5, 80.0])
    mean, cov = kf_xyah.initiate(meas)
    mean, cov = kf_xyah.predict(mean, cov)
    ms = jnp.stack(
        [meas, jnp.asarray([500.0, 500.0, 0.5, 80.0])], axis=0
    )
    d = kf_xyah.gating_distance(mean, cov, ms)
    assert d.shape == (2,)
    assert float(d[0]) < float(d[1])
    d2 = kf_xyah.gating_distance(mean, cov, ms, only_position=True)
    assert float(d2[0]) < float(d2[1])


def test_xywh_roundtrip_batched():
    meas = jnp.broadcast_to(jnp.asarray([30.0, 60.0, 40.0, 80.0]), (8, 4))
    mean, cov = kf_xywh.initiate(meas)
    assert mean.shape == (8, 8) and cov.shape == (8, 8, 8)
    mean, cov = kf_xywh.predict(mean, cov)
    mean, cov = kf_xywh.update(mean, cov, meas)
    assert np.all(np.isfinite(np.asarray(mean)))
    # all slots identical input -> identical output
    np.testing.assert_allclose(mean[0], mean[7], atol=1e-5)


def test_multi_predict_equals_sequential():
    """Batched predict must equal per-track predict (reference exposes
    multi_predict for this, kalman_filter.cpp:114-146)."""
    rng = np.random.default_rng(0)
    meas = jnp.asarray(rng.random((5, 4), np.float32) * 100 + 10)
    mean, cov = kf_xyah.initiate(meas)
    bm, bc = kf_xyah.predict(mean, cov)
    for i in range(5):
        sm, sc = kf_xyah.predict(mean[i], cov[i])
        np.testing.assert_allclose(bm[i], sm, rtol=1e-5)
        np.testing.assert_allclose(bc[i], sc, rtol=1e-5)
