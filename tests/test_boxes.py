"""Box conversion tests (model: reference tests/test_kalman_filter.cpp
roundtrip expectations + utils/ops.hpp semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.ops import boxes


BOX = np.array([10.0, 20.0, 50.0, 100.0], np.float32)  # xyxy


def test_xyxy_xywh_roundtrip():
    xywh = boxes.xyxy2xywh(jnp.asarray(BOX))
    np.testing.assert_allclose(xywh, [30.0, 60.0, 40.0, 80.0], atol=1e-5)
    back = boxes.xywh2xyxy(xywh)
    np.testing.assert_allclose(back, BOX, atol=1e-5)


def test_xyxy_tlwh_roundtrip():
    tlwh = boxes.xyxy2tlwh(jnp.asarray(BOX))
    np.testing.assert_allclose(tlwh, [10.0, 20.0, 40.0, 80.0], atol=1e-5)
    np.testing.assert_allclose(boxes.tlwh2xyxy(tlwh), BOX, atol=1e-5)


def test_tlwh_xyah_roundtrip():
    tlwh = jnp.asarray([10.0, 20.0, 40.0, 80.0])
    xyah = boxes.tlwh2xyah(tlwh)
    np.testing.assert_allclose(xyah, [30.0, 60.0, 0.5, 80.0], atol=1e-5)
    np.testing.assert_allclose(boxes.xyah2tlwh(xyah), tlwh, atol=1e-5)


def test_xysr_roundtrip():
    xysr = boxes.xyxy2xysr(jnp.asarray(BOX))
    np.testing.assert_allclose(xysr, [30.0, 60.0, 3200.0, 0.5], atol=1e-3)
    np.testing.assert_allclose(boxes.xysr2xyxy(xysr), BOX, atol=1e-3)


def test_degenerate_height_aspect_zero():
    # h <= 0 -> aspect 0 (reference: utils/ops.hpp:83)
    tlwh = jnp.asarray([0.0, 0.0, 10.0, 0.0])
    xyah = boxes.tlwh2xyah(tlwh)
    assert float(xyah[2]) == 0.0


def test_batched_shapes():
    batch = jnp.asarray(np.tile(BOX, (5, 1)))
    assert boxes.xyxy2xywh(batch).shape == (5, 4)
    assert boxes.xyxy2xysr(batch).shape == (5, 4)
    # arbitrary leading axes
    nested = jnp.asarray(np.tile(BOX, (2, 3, 1)))
    assert boxes.xywh2xyxy(nested).shape == (2, 3, 4)
