"""Cost-fusion function tests (model: reference src/utils/matching.cpp
semantics beyond the assignment already covered in test_lap.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.ops.matching import (
    CHI2INV95,
    embedding_distance,
    fuse_iou,
    fuse_motion,
    fuse_score,
    iou_distance,
)


def test_iou_distance_is_one_minus_iou():
    a = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
    assert float(iou_distance(a, a)[0, 0]) == pytest.approx(0.0)
    b = jnp.asarray([[200.0, 200.0, 300.0, 300.0]])
    assert float(iou_distance(a, b)[0, 0]) == pytest.approx(1.0)


def test_embedding_distance_cosine():
    t = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    d = jnp.asarray([[1.0, 0.0], [-1.0, 0.0]])
    m = embedding_distance(t, d, "cosine")
    # identical direction -> 0; opposite -> clamped at max(0, 1-(-1)) = 2
    assert float(m[0, 0]) == pytest.approx(0.0, abs=1e-5)
    assert float(m[0, 1]) == pytest.approx(2.0, abs=1e-5)
    # orthogonal -> 1 (norms cancel)
    assert float(m[1, 0]) == pytest.approx(1.0, abs=1e-5)


def test_embedding_distance_euclidean():
    t = jnp.asarray([[0.0, 0.0]])
    d = jnp.asarray([[3.0, 4.0]])
    m = embedding_distance(t, d, "euclidean")
    assert float(m[0, 0]) == pytest.approx(5.0, abs=1e-5)
    with pytest.raises(ValueError):
        embedding_distance(t, d, "bogus")


def test_fuse_score():
    """cost' = 1 - (1 - cost) * conf (matching.cpp:130-143)."""
    iou_cost = jnp.asarray([[0.2, 0.5]])
    confs = jnp.asarray([0.9, 0.5])
    out = fuse_score(iou_cost, confs)
    np.testing.assert_allclose(
        np.asarray(out), [[1 - 0.8 * 0.9, 1 - 0.5 * 0.5]], atol=1e-6
    )


def test_fuse_iou():
    """cost' = 1 - reid_sim * (1 + iou_sim)/2 (matching.cpp:109-128)."""
    a = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
    reid_cost = jnp.asarray([[0.3]])
    out = fuse_iou(reid_cost, a, a)  # iou_sim = 1
    assert float(out[0, 0]) == pytest.approx(1 - 0.7 * 1.0, abs=1e-6)


def test_fuse_motion_gating_and_blend():
    """lambda-blend below the chi2 gate, +inf above (matching.hpp:61-94)."""
    cost = jnp.asarray([[0.4, 0.4]])
    gating = jnp.asarray([[1.0, CHI2INV95[3] + 1.0]])
    out = np.asarray(fuse_motion(cost, gating, lam=0.98))
    assert out[0, 0] == pytest.approx(0.98 * 0.4 + 0.02 * 1.0, abs=1e-6)
    assert np.isinf(out[0, 1])


def test_chi2_table_values():
    # reference: utils/matching.hpp:16-26
    assert CHI2INV95[1] == pytest.approx(5.9915)
    assert CHI2INV95[3] == pytest.approx(9.4877)
