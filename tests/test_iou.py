"""IoU-family tests (model: reference tests/test_iou.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.ops import iou

BOX1 = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
BOX2 = jnp.asarray([[50.0, 50.0, 150.0, 150.0]])
BOX3 = jnp.asarray([[200.0, 200.0, 300.0, 300.0]])


def test_identical_boxes_iou_one():
    assert float(iou.iou_batch(BOX1, BOX1)[0, 0]) == pytest.approx(1.0)


def test_disjoint_boxes_iou_zero():
    assert float(iou.iou_batch(BOX1, BOX3)[0, 0]) == 0.0


def test_overlapping_iou_value():
    # inter 2500, union 17500 -> ~0.143 (reference: test_iou.cpp:37-44)
    assert float(iou.iou_batch(BOX1, BOX2)[0, 0]) == pytest.approx(0.143, abs=0.01)


def test_batch_shape_and_values():
    a = jnp.concatenate([BOX1, BOX2], 0)
    b = jnp.concatenate([BOX1, BOX3], 0)
    m = iou.iou_batch(a, b)
    assert m.shape == (2, 2)
    assert float(m[0, 0]) == pytest.approx(1.0)
    assert float(m[0, 1]) == 0.0


@pytest.mark.parametrize("fn", [iou.giou_batch, iou.diou_batch, iou.ciou_batch])
def test_scaled_variants_in_unit_range(fn):
    v = float(fn(BOX1, BOX2)[0, 0])
    assert 0.0 <= v <= 1.0


@pytest.mark.parametrize("fn", [iou.diou_batch, iou.ciou_batch])
def test_diou_ciou_identical_is_one(fn):
    assert float(fn(BOX1, BOX1)[0, 0]) == pytest.approx(1.0, abs=1e-5)


def test_giou_identical_matches_reference_quirk():
    """The reference recovers intersection as iou*(A1+A2)/(iou+1e-10)
    (reference: utils/iou.hpp:185), which for identical boxes yields
    union=0 and GIoU=0.5 after rescaling. We reproduce that behavior
    bit-for-bit rather than the textbook GIoU=1."""
    assert float(iou.giou_batch(BOX1, BOX1)[0, 0]) == pytest.approx(0.5, abs=1e-4)


def test_hmiou_identical_and_product_form():
    assert float(iou.hmiou_batch(BOX1, BOX1)[0, 0]) == pytest.approx(1.0)
    # hmiou = iou * vertical overlap ratio <= iou
    assert float(iou.hmiou_batch(BOX1, BOX2)[0, 0]) <= float(
        iou.iou_batch(BOX1, BOX2)[0, 0]
    )


def test_centroid_range():
    v = float(iou.centroid_batch(BOX1, BOX3, 640, 480)[0, 0])
    assert 0.0 < v < 1.0
    # identical centers -> similarity 1
    assert float(iou.centroid_batch(BOX1, BOX1, 640, 480)[0, 0]) == pytest.approx(1.0)


def test_asso_dispatch():
    fn = iou.get_asso_fn("iou", 640, 480)
    assert float(fn(BOX1, BOX2)[0, 0]) == pytest.approx(0.143, abs=0.01)
    with pytest.raises(ValueError):
        iou.get_asso_fn("bogus")
    for mode in iou.ASSO_FUNCS:
        iou.get_asso_fn(mode, 640, 480)


def test_obb_axis_aligned_matches_aabb():
    # zero-angle OBBs must agree with axis-aligned IoU
    obb1 = jnp.asarray([[50.0, 50.0, 100.0, 100.0, 0.0]])
    obb2 = jnp.asarray([[100.0, 100.0, 100.0, 100.0, 0.0]])
    got = float(iou.iou_batch_obb(obb1, obb2)[0, 0])
    assert got == pytest.approx(0.143, abs=0.01)
    assert float(iou.iou_batch_obb(obb1, obb1)[0, 0]) == pytest.approx(1.0, abs=1e-4)


def test_obb_rotated_square_overlap():
    # 45-degree rotated square over identical square: octagon intersection,
    # analytic IoU = 2*(sqrt(2)-1)/(2-(sqrt(2)-1)... use known value ~0.7071/1.2929
    s2 = np.sqrt(2.0)
    expected = (4 * (s2 - 1.0) * 2) / (2.0 - (4 * (s2 - 1.0) * 2) / 2) / 2
    obb = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    rot = jnp.asarray([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    got = float(iou.iou_batch_obb(obb, rot)[0, 0])
    # octagon area = 8*(sqrt(2)-1); union = 8 - 8*(sqrt(2)-1)
    inter = 8 * (s2 - 1.0)
    union = 4 + 4 - inter
    assert got == pytest.approx(inter / union, abs=1e-3)


def test_vmapped_batch_axes():
    import jax

    a = jnp.broadcast_to(BOX1, (3, 1, 4))
    b = jnp.broadcast_to(BOX2, (3, 1, 4))
    out = jax.vmap(iou.iou_batch)(a, b)
    assert out.shape == (3, 1, 1)
