"""Bounding-box format conversions, batched over a leading axis.

TPU-native equivalent of the reference's scalar+batch conversion helpers
(reference: include/motcpp/utils/ops.hpp:14-213). All functions take
``(..., 4)`` arrays and vectorize over any leading shape — there is no
scalar/batch split because jnp broadcasting subsumes both, and under
``vmap``/``jit`` these fuse into surrounding kernels.

Formats:
  * ``xyxy``: (x1, y1, x2, y2) corner boxes
  * ``xywh``: (cx, cy, w, h) center boxes
  * ``tlwh``: (top-left-x, top-left-y, w, h)
  * ``xyah``: (cx, cy, aspect=w/h, h)   — ByteTrack/StrongSORT KF space
  * ``xysr``: (cx, cy, scale=w*h, ratio=w/h) — SORT/OC-SORT KF space
"""

from __future__ import annotations

import jax.numpy as jnp


def xyxy2xywh(xyxy: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate([x1 + 0.5 * w, y1 + 0.5 * h, w, h], axis=-1)


def xywh2xyxy(xywh: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = jnp.split(xywh, 4, axis=-1)
    hw = 0.5 * w
    hh = 0.5 * h
    return jnp.concatenate([xc - hw, yc - hh, xc + hw, yc + hh], axis=-1)


def xywh2tlwh(xywh: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = jnp.split(xywh, 4, axis=-1)
    return jnp.concatenate([xc - 0.5 * w, yc - 0.5 * h, w, h], axis=-1)


def tlwh2xywh(tlwh: jnp.ndarray) -> jnp.ndarray:
    t, l, w, h = jnp.split(tlwh, 4, axis=-1)
    return jnp.concatenate([t + 0.5 * w, l + 0.5 * h, w, h], axis=-1)


def tlwh2xyxy(tlwh: jnp.ndarray) -> jnp.ndarray:
    t, l, w, h = jnp.split(tlwh, 4, axis=-1)
    return jnp.concatenate([t, l, t + w, l + h], axis=-1)


def xyxy2tlwh(xyxy: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def tlwh2xyah(tlwh: jnp.ndarray) -> jnp.ndarray:
    """Aspect ratio a = w/h, guarded for h <= 0 like the reference
    (reference: utils/ops.hpp:79-85 returns a=0 when h<=0)."""
    t, l, w, h = jnp.split(tlwh, 4, axis=-1)
    a = jnp.where(h > 0.0, w / jnp.where(h > 0.0, h, 1.0), 0.0)
    return jnp.concatenate([t + 0.5 * w, l + 0.5 * h, a, h], axis=-1)


def xyah2tlwh(xyah: jnp.ndarray) -> jnp.ndarray:
    xc, yc, a, h = jnp.split(xyah, 4, axis=-1)
    w = a * h
    return jnp.concatenate([xc - 0.5 * w, yc - 0.5 * h, w, h], axis=-1)


def xywh2xyah(xywh: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = jnp.split(xywh, 4, axis=-1)
    a = jnp.where(h > 0.0, w / jnp.where(h > 0.0, h, 1.0), 0.0)
    return jnp.concatenate([xc, yc, a, h], axis=-1)


def xyah2xywh(xyah: jnp.ndarray) -> jnp.ndarray:
    xc, yc, a, h = jnp.split(xyah, 4, axis=-1)
    return jnp.concatenate([xc, yc, a * h, h], axis=-1)


def xyxy2xyah(xyxy: jnp.ndarray) -> jnp.ndarray:
    return tlwh2xyah(xyxy2tlwh(xyxy))


def xyah2xyxy(xyah: jnp.ndarray) -> jnp.ndarray:
    return tlwh2xyxy(xyah2tlwh(xyah))


def xyxy2xysr(xyxy: jnp.ndarray) -> jnp.ndarray:
    """(x1,y1,x2,y2) -> (cx, cy, s=w*h, r=w/h); r guarded at h<=1e-6
    (reference: utils/ops.hpp:188-197)."""
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    s = w * h
    r = jnp.where(h > 1e-6, w / jnp.where(h > 1e-6, h, 1.0), 0.0)
    return jnp.concatenate([x1 + 0.5 * w, y1 + 0.5 * h, s, r], axis=-1)


def xysr2xyxy(xysr: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, s, r) -> (x1,y1,x2,y2) with w = sqrt(s*r), h = s/w
    (reference: utils/ops.hpp:202-211). Negative s*r yields NaN, matching
    the reference's std::sqrt domain-error behavior that drives NaN-track
    pruning (reference: src/trackers/sort.cpp:129-137)."""
    xc, yc, s, r = jnp.split(xysr, 4, axis=-1)
    w = jnp.sqrt(s * r)
    h = s / jnp.where(w != 0.0, w, 1e-12)
    hw = 0.5 * w
    hh = 0.5 * h
    return jnp.concatenate([xc - hw, yc - hh, xc + hw, yc + hh], axis=-1)
