"""Pairwise IoU-family similarity matrices as (N, M) broadcast ops.

TPU-native equivalent of the reference's O(N*M) Eigen loops (reference:
include/motcpp/utils/iou.hpp:63-368). Every function takes two box sets
``boxes1 (..., N, 4)`` / ``boxes2 (..., M, 4)`` in xyxy and returns an
``(..., N, M)`` matrix; on TPU these lower to a handful of fused VPU
broadcasts — no loops, no dynamic shapes. Padded (masked-out) rows/cols
simply produce garbage values that downstream masking ignores.

Similarity conventions (identical to the reference):
  * ``iou``: plain IoU in [0, 1]
  * ``hmiou``: IoU * vertical-overlap ratio (iou.hpp:122-150)
  * ``giou``/``diou``/``ciou``: rescaled from [-1, 1] to [0, 1]
    (iou.hpp:155-295)
  * ``centroid``: 1 - normalized center distance (iou.hpp:300-333)

Oriented-box (OBB) variants operate on (cx, cy, w, h, angle) rows and use
an exact convex polygon clip instead of cv::rotatedRectangleIntersection
(iou.hpp:30-56) — implemented as fixed-capacity Sutherland-Hodgman so it
stays jit-compatible.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _areas(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def iou_batch(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. union<=0 -> 0 (reference: utils/iou.hpp:63-99)."""
    a = b1[..., :, None, :]
    b = b2[..., None, :, :]
    xx1 = jnp.maximum(a[..., 0], b[..., 0])
    yy1 = jnp.maximum(a[..., 1], b[..., 1])
    xx2 = jnp.minimum(a[..., 2], b[..., 2])
    yy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(0.0, xx2 - xx1) * jnp.maximum(0.0, yy2 - yy1)
    union = _areas(b1)[..., :, None] + _areas(b2)[..., None, :] - inter
    return jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)


def hmiou_batch(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Height-modified IoU: IoU * vertical intersection/union ratio
    (reference: utils/iou.hpp:122-150)."""
    a = b1[..., :, None, :]
    b = b2[..., None, :, :]
    inter_h = jnp.maximum(
        0.0, jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1])
    )
    union_h = jnp.maximum(
        1e-10, jnp.maximum(a[..., 3], b[..., 3]) - jnp.minimum(a[..., 1], b[..., 1])
    )
    return iou_batch(b1, b2) * inter_h / union_h


def _enclosing_wh(a: jnp.ndarray, b: jnp.ndarray):
    xxc1 = jnp.minimum(a[..., 0], b[..., 0])
    yyc1 = jnp.minimum(a[..., 1], b[..., 1])
    xxc2 = jnp.maximum(a[..., 2], b[..., 2])
    yyc2 = jnp.maximum(a[..., 3], b[..., 3])
    return xxc2 - xxc1, yyc2 - yyc1


def giou_batch(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU rescaled to [0, 1] (reference: utils/iou.hpp:155-192).

    Mirrors the reference's algebra exactly, including recovering the
    intersection from IoU via ``iou * (A1 + A2) / (iou + 1e-10)``."""
    a = b1[..., :, None, :]
    b = b2[..., None, :, :]
    iou = iou_batch(b1, b2)
    wc, hc = _enclosing_wh(a, b)
    area_enclose = wc * hc
    area1 = _areas(b1)[..., :, None]
    area2 = _areas(b2)[..., None, :]
    inter = iou * (area1 + area2) / (iou + 1e-10)
    union = area1 + area2 - inter
    giou = iou - (area_enclose - union) / (area_enclose + 1e-10)
    return (giou + 1.0) / 2.0


def _center_dist2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    cx1 = (a[..., 0] + a[..., 2]) * 0.5
    cy1 = (a[..., 1] + a[..., 3]) * 0.5
    cx2 = (b[..., 0] + b[..., 2]) * 0.5
    cy2 = (b[..., 1] + b[..., 3]) * 0.5
    return (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2


def diou_batch(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Distance IoU rescaled to [0, 1] (reference: utils/iou.hpp:258-295)."""
    a = b1[..., :, None, :]
    b = b2[..., None, :, :]
    iou = iou_batch(b1, b2)
    inner = _center_dist2(a, b)
    wc, hc = _enclosing_wh(a, b)
    outer = wc**2 + hc**2
    diou = iou - inner / (outer + 1e-10)
    return (diou + 1.0) / 2.0


def ciou_batch(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU with aspect-ratio penalty, rescaled to [0, 1]
    (reference: utils/iou.hpp:197-253)."""
    eps = 1e-7
    a = b1[..., :, None, :]
    b = b2[..., None, :, :]
    iou = iou_batch(b1, b2)
    inner = _center_dist2(a, b)
    wc, hc = _enclosing_wh(a, b)
    outer = wc**2 + hc**2 + eps
    w1 = a[..., 2] - a[..., 0]
    h1 = a[..., 3] - a[..., 1]
    w2 = b[..., 2] - b[..., 0]
    h2 = b[..., 3] - b[..., 1]
    arctan_diff = jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    v = (4.0 / (math.pi**2)) * arctan_diff**2
    s = 1.0 - iou
    alpha = v / (s + v + eps)
    ciou = iou - inner / outer + alpha * v
    return (ciou + 1.0) / 2.0


def centroid_batch(
    b1: jnp.ndarray, b2: jnp.ndarray, frame_width: int, frame_height: int
) -> jnp.ndarray:
    """1 - normalized centroid distance (reference: utils/iou.hpp:300-333)."""
    a = b1[..., :, None, :]
    b = b2[..., None, :, :]
    d = jnp.sqrt(_center_dist2(a, b))
    norm = math.sqrt(float(frame_width) ** 2 + float(frame_height) ** 2)
    return 1.0 - d / norm


def centroid_batch_obb(
    b1: jnp.ndarray, b2: jnp.ndarray, frame_width: int, frame_height: int
) -> jnp.ndarray:
    """Centroid similarity for oriented boxes — centers are columns 0:2
    directly (reference: utils/iou.hpp:338-366)."""
    dx = b1[..., :, None, 0] - b2[..., None, :, 0]
    dy = b1[..., :, None, 1] - b2[..., None, :, 1]
    d = jnp.sqrt(dx**2 + dy**2)
    norm = math.sqrt(float(frame_width) ** 2 + float(frame_height) ** 2)
    return 1.0 - d / norm


# ---------------------------------------------------------------------------
# Oriented (rotated) box IoU — jit-compatible convex clipping
# ---------------------------------------------------------------------------

_P_CAP = 12  # intersection of two quads has <= 8 vertices; 12 gives slack


def _obb_corners(obb: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) [cx, cy, w, h, angle_rad] -> (..., 4, 2) CCW corner points."""
    cx, cy, w, h, ang = (obb[..., i] for i in range(5))
    c, s = jnp.cos(ang), jnp.sin(ang)
    dx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    dy = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return jnp.stack([x, y], axis=-1)


def _compact_front(pts: jnp.ndarray, mask: jnp.ndarray):
    """Stable-move valid rows of a padded vertex list to the front.

    Uses a stable argsort on ~mask: False (valid) sorts before True,
    preserving relative order — a gather, not a scatter, so it
    vectorizes cleanly on TPU.
    """
    order = jnp.argsort(~mask, axis=-1, stable=True)
    pts_c = jnp.take_along_axis(pts, order[..., None], axis=-2)
    n = jnp.sum(mask, axis=-1)
    valid = jnp.arange(pts.shape[-2]) < n[..., None]
    return pts_c, valid


def _clip_halfplane(pts: jnp.ndarray, valid: jnp.ndarray, a, b, c):
    """One Sutherland-Hodgman step: clip padded convex polygon by the
    half-plane a*x + b*y + c >= 0. Capacity is fixed at ``2 * P`` before
    re-compaction back to P."""
    P = pts.shape[-2]
    n = jnp.sum(valid, axis=-1)
    idx = jnp.arange(P)
    nxt_idx = jnp.where(idx + 1 >= n[..., None], 0, idx + 1).astype(jnp.int32)
    nxt = jnp.take_along_axis(pts, nxt_idx[..., None], axis=-2)

    d_cur = a[..., None] * pts[..., 0] + b[..., None] * pts[..., 1] + c[..., None]
    d_nxt = a[..., None] * nxt[..., 0] + b[..., None] * nxt[..., 1] + c[..., None]
    inside_cur = d_cur >= 0.0
    inside_nxt = d_nxt >= 0.0
    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    inter = pts + t[..., None] * (nxt - pts)

    is_edge = idx < n[..., None]
    emit_cur = inside_cur & is_edge
    emit_int = (inside_cur != inside_nxt) & is_edge

    # Interleave [cur_0, inter_0, cur_1, inter_1, ...] to keep edge order.
    out_pts = jnp.stack([pts, inter], axis=-2).reshape(pts.shape[:-2] + (2 * P, 2))
    out_mask = jnp.stack([emit_cur, emit_int], axis=-1).reshape(
        valid.shape[:-1] + (2 * P,)
    )
    out_pts, out_valid = _compact_front(out_pts, out_mask)
    return out_pts[..., :P, :], out_valid[..., :P]


def _polygon_area(pts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of a front-packed padded polygon."""
    P = pts.shape[-2]
    n = jnp.sum(valid, axis=-1)
    idx = jnp.arange(P)
    nxt_idx = jnp.where(idx + 1 >= n[..., None], 0, idx + 1).astype(jnp.int32)
    nxt = jnp.take_along_axis(pts, nxt_idx[..., None], axis=-2)
    cross = pts[..., 0] * nxt[..., 1] - nxt[..., 0] * pts[..., 1]
    cross = jnp.where(valid, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross, axis=-1))


def iou_obb_pair(obb1: jnp.ndarray, obb2: jnp.ndarray) -> jnp.ndarray:
    """IoU of oriented boxes (..., 5) via exact convex clipping
    (reference: utils/iou.hpp:30-56 uses cv::rotatedRectangleIntersection;
    here a fixed-capacity Sutherland-Hodgman clip keeps it jittable)."""
    c1 = _obb_corners(obb1)  # (..., 4, 2)
    c2 = _obb_corners(obb2)
    batch = c1.shape[:-2]
    pts = jnp.concatenate(
        [c1, jnp.zeros(batch + (_P_CAP - 4, 2), dtype=c1.dtype)], axis=-2
    )
    valid = jnp.concatenate(
        [jnp.ones(batch + (4,), bool), jnp.zeros(batch + (_P_CAP - 4,), bool)],
        axis=-1,
    )
    for k in range(4):
        p0 = c2[..., k, :]
        p1 = c2[..., (k + 1) % 4, :]
        # inward normal of a CCW polygon edge: (-(y1-y0), x1-x0)
        a = -(p1[..., 1] - p0[..., 1])
        b = p1[..., 0] - p0[..., 0]
        c = -(a * p0[..., 0] + b * p0[..., 1])
        pts, valid = _clip_halfplane(pts, valid, a, b, c)
    inter = _polygon_area(pts, valid)
    inter = jnp.where(jnp.sum(valid, axis=-1) >= 3, inter, 0.0)
    area1 = obb1[..., 2] * obb1[..., 3]
    area2 = obb2[..., 2] * obb2[..., 3]
    union = area1 + area2 - inter
    return jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)


def iou_batch_obb(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise oriented-box IoU (reference: utils/iou.hpp:105-117)."""
    a = b1[..., :, None, :]
    b = b2[..., None, :, :]
    a, b = jnp.broadcast_arrays(a, b)
    return iou_obb_pair(a, b)


# ---------------------------------------------------------------------------
# Dispatch (reference: utils/iou.hpp:371-412 AssociationFunction)
# ---------------------------------------------------------------------------

ASSO_FUNCS = (
    "iou",
    "iou_obb",
    "hmiou",
    "giou",
    "ciou",
    "diou",
    "centroid",
    "centroid_obb",
)


def get_asso_fn(mode: str, frame_width: int = 0, frame_height: int = 0):
    """String -> cost-fn dispatch identical to the reference's
    AssociationFunction (reference: utils/iou.hpp:385-409). Centroid
    variants capture frame dimensions at construction."""
    if mode == "iou":
        return iou_batch
    if mode == "iou_obb":
        return iou_batch_obb
    if mode == "hmiou":
        return hmiou_batch
    if mode == "giou":
        return giou_batch
    if mode == "ciou":
        return ciou_batch
    if mode == "diou":
        return diou_batch
    if mode == "centroid":
        return lambda a, b: centroid_batch(a, b, frame_width, frame_height)
    if mode == "centroid_obb":
        return lambda a, b: centroid_batch_obb(a, b, frame_width, frame_height)
    raise ValueError(f"Invalid association mode: {mode}")
