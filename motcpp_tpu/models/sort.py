"""SORT — Simple Online and Realtime Tracking, TPU-native.

Functional re-design of the reference tracker (reference:
src/trackers/sort.cpp:82-255, include/motcpp/trackers/sort.hpp:69-90).
The C++ ``std::vector<SortTrack>`` with per-track 7D Kalman filters
becomes a fixed-capacity struct-of-arrays state; one frame is a pure
``step`` of masked array ops:

    conf filter -> batched KF predict -> NaN prune -> (K, N) IoU cost
    -> masked JV assignment -> batched KF update -> births -> deaths
    -> output gate

so whole videos run under ``lax.scan`` and many streams batch with
``vmap``/``shard_map``. Behavioral parity notes:
  * output gate ``tsu == 0 and (hits >= min_hits or frame <= min_hits)``
    (reference: sort.cpp:225-227)
  * death when ``time_since_update > max_age`` *after* births
    (reference: sort.cpp:206-215), default max_age=1
  * NaN states pruned before association (reference: sort.cpp:129-137)
  * new-track IDs increase in detection order (reference: sort.cpp:16-19
    uses a process-global counter; ours is per-instance, which only
    changes absolute ID values, never within-sequence uniqueness)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.ops import boxes
from motcpp_tpu.ops.iou import iou_batch, iou_batch_obb
from motcpp_tpu.ops.kalman.xysr import (
    DIM_X,
    XYSRParams,
    xysr_init,
    xysr_predict,
    xysr_update,
)
from motcpp_tpu.ops.lap import solve_lap_masked


@dataclasses.dataclass(frozen=True)
class SortConfig:
    """Constructor parameters (reference: sort.hpp:69-77 defaults)."""

    det_thresh: float = 0.3
    max_age: int = 1
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    # TPU capacity knobs (the reference grows vectors dynamically)
    max_tracks: int = 256
    max_dets: int = 128
    # assignment kernel: "jv" (exact) or "auction" (TPU-fast, eps-optimal)
    lap_impl: str = "jv"
    # oriented-box mode: dets are (N, 7) [cx, cy, w, h, angle, conf, cls],
    # association is exact rotated IoU (ops.iou.iou_batch_obb), the KF
    # tracks the axis-aligned XYSR of (cx, cy, w*h, w/h) and the angle is
    # carried in state (snap-to-measurement on match, held while
    # coasting); output rows are (K, 9) [cx, cy, w, h, angle, id, conf,
    # cls, det_ind]. NOTE this goes beyond the reference, whose OBB flow
    # is de-facto degenerate: sort.cpp:112 reads dets(i, 4) — the ANGLE
    # column in 7-col input — as the confidence, and its KF consumes
    # [cx, cy, w, h] as if it were [x1, y1, x2, y2] (sort.cpp:60-76);
    # docs/accuracy.md documents the parity note.
    is_obb: bool = False


class SortState(NamedTuple):
    x: jnp.ndarray  # (K, 7) KF state
    P: jnp.ndarray  # (K, 7, 7) KF covariance
    ang: jnp.ndarray  # (K,) box angle (OBB mode; zeros for AABB)
    active: jnp.ndarray  # (K,) bool
    tid: jnp.ndarray  # (K,) int32 track id
    conf: jnp.ndarray  # (K,)
    cls: jnp.ndarray  # (K,)
    det_ind: jnp.ndarray  # (K,) int32
    hits: jnp.ndarray  # (K,) int32
    tsu: jnp.ndarray  # (K,) int32 time_since_update
    age: jnp.ndarray  # (K,) int32
    next_id: jnp.ndarray  # () int32 — last id handed out
    frame_count: jnp.ndarray  # () int32


def make_sort(cfg: SortConfig):
    """Build (init_fn, step_fn) closures over a static config."""

    K = cfg.max_tracks
    kf = XYSRParams()  # SORT uses the raw filter defaults (sort.cpp:29)
    # column layout: OBB input is [cx, cy, w, h, angle, conf, cls]
    CONF = 5 if cfg.is_obb else 4
    CLS = 6 if cfg.is_obb else 5

    def init_fn() -> SortState:
        return SortState(
            x=jnp.zeros((K, DIM_X), jnp.float32),
            P=jnp.broadcast_to(jnp.eye(DIM_X), (K, DIM_X, DIM_X)).astype(
                jnp.float32
            ),
            ang=jnp.zeros((K,), jnp.float32),
            active=jnp.zeros((K,), bool),
            tid=jnp.zeros((K,), jnp.int32),
            conf=jnp.zeros((K,), jnp.float32),
            cls=jnp.zeros((K,), jnp.float32),
            det_ind=jnp.full((K,), -1, jnp.int32),
            hits=jnp.zeros((K,), jnp.int32),
            tsu=jnp.zeros((K,), jnp.int32),
            age=jnp.zeros((K,), jnp.int32),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def step_fn(state: SortState, dets, det_mask, embs=None):
        """One frame. dets (N, >=6), det_mask (N,) bool. embs unused
        (reference: sort.cpp:105-106)."""
        del embs
        N = dets.shape[0]
        frame_count = state.frame_count + 1

        # --- confidence filter (reference: sort.cpp:111-122) ------------
        valid = det_mask & (dets[:, CONF] >= cfg.det_thresh)

        # --- batched predict on active slots (reference: sort.cpp:127-135)
        px, pP = xysr_predict(state.x, state.P, kf)
        x = jnp.where(state.active[:, None], px, state.x)
        P = jnp.where(state.active[:, None, None], pP, state.P)
        tsu = jnp.where(state.active, state.tsu + 1, state.tsu)
        age = jnp.where(state.active, state.age + 1, state.age)

        # --- NaN prune (reference: sort.cpp:131-137) ---------------------
        trk_xyxy = boxes.xysr2xyxy(x[:, :4])
        finite = jnp.all(jnp.isfinite(trk_xyxy), axis=-1)
        active = state.active & finite

        # --- association: 1 - IoU, thresh 1 - iou_thr (sort.cpp:168-178) -
        if cfg.is_obb:
            # exact rotated IoU on [cx, cy, w, h, angle]
            s_ = jnp.maximum(x[:, 2], 1e-6)
            r_ = jnp.maximum(x[:, 3], 1e-6)
            tw = jnp.sqrt(s_ * r_)
            th = jnp.sqrt(s_ / r_)
            trk_obb = jnp.stack([x[:, 0], x[:, 1], tw, th, state.ang], -1)
            cost = 1.0 - iou_batch_obb(trk_obb, dets[:, :5])
        else:
            cost = 1.0 - iou_batch(trk_xyxy, dets[:, :4])
        r2c, c2r = solve_lap_masked(
            cost, active, valid, 1.0 - cfg.iou_threshold, impl=cfg.lap_impl
        )

        # --- matched updates (reference: sort.cpp:181-193) ---------------
        matched = r2c >= 0
        j = jnp.clip(r2c, 0, N - 1)
        det_rows = dets[j]  # (K, >=6) gathered
        if cfg.is_obb:
            z = jnp.stack(
                [det_rows[:, 0], det_rows[:, 1],
                 det_rows[:, 2] * det_rows[:, 3],
                 det_rows[:, 2] / jnp.maximum(det_rows[:, 3], 1e-6)], -1)
        else:
            z = boxes.xyxy2xysr(det_rows[:, :4])
        ux, uP = xysr_update(x, P, z, kf)
        x = jnp.where(matched[:, None], ux, x)
        P = jnp.where(matched[:, None, None], uP, P)
        ang = (jnp.where(matched, det_rows[:, 4], state.ang)
               if cfg.is_obb else state.ang)
        conf = jnp.where(matched, det_rows[:, CONF], state.conf)
        cls = jnp.where(matched, det_rows[:, CLS], state.cls)
        det_ind = jnp.where(matched, j, state.det_ind)
        hits = jnp.where(matched, state.hits + 1, state.hits)
        tsu = jnp.where(matched, 0, tsu)

        # --- births: unmatched valid dets -> free slots in det order -----
        # (reference: sort.cpp:196-204 emplaces in detection order)
        unmatched_det = valid & (c2r < 0)
        free = ~active
        det_rank = jnp.cumsum(unmatched_det.astype(jnp.int32)) - 1
        slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        n_unmatched = jnp.sum(unmatched_det.astype(jnp.int32))
        # position of the unmatched det with a given rank
        pos_by_rank = (
            jnp.full((K,), N, jnp.int32)
            .at[jnp.where(unmatched_det, det_rank, K)]
            .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        )
        births = free & (slot_rank < n_unmatched)
        bdet = jnp.where(births, pos_by_rank[jnp.clip(slot_rank, 0, K - 1)], 0)
        bdet_rows = dets[bdet]
        if cfg.is_obb:
            bz = jnp.stack(
                [bdet_rows[:, 0], bdet_rows[:, 1],
                 bdet_rows[:, 2] * bdet_rows[:, 3],
                 bdet_rows[:, 2] / jnp.maximum(bdet_rows[:, 3], 1e-6)], -1)
            ang = jnp.where(births, bdet_rows[:, 4], ang)
        else:
            bz = boxes.xyxy2xysr(bdet_rows[:, :4])
        bx, bP = xysr_init(bz, kf)
        x = jnp.where(births[:, None], bx, x)
        P = jnp.where(births[:, None, None], bP, P)
        conf = jnp.where(births, bdet_rows[:, CONF], conf)
        cls = jnp.where(births, bdet_rows[:, CLS], cls)
        det_ind = jnp.where(births, bdet, det_ind)
        hits = jnp.where(births, 1, hits)
        tsu = jnp.where(births, 0, tsu)
        age = jnp.where(births, 1, age)
        tid = jnp.where(
            births, state.next_id + 1 + slot_rank, state.tid
        )
        n_births = jnp.minimum(n_unmatched, jnp.sum(free.astype(jnp.int32)))
        next_id = state.next_id + n_births
        active = active | births

        # --- deaths (reference: sort.cpp:206-215) ------------------------
        active = active & (tsu <= cfg.max_age)

        # --- output gate (reference: sort.cpp:221-241) -------------------
        out_mask = active & (tsu == 0) & (
            (hits >= cfg.min_hits) | (frame_count <= cfg.min_hits)
        )
        tail = [
            tid[:, None].astype(jnp.float32),
            conf[:, None],
            cls[:, None],
            det_ind[:, None].astype(jnp.float32),
        ]
        if cfg.is_obb:
            s_ = jnp.maximum(x[:, 2], 1e-6)
            r_ = jnp.maximum(x[:, 3], 1e-6)
            obb5 = jnp.stack(
                [x[:, 0], x[:, 1], jnp.sqrt(s_ * r_), jnp.sqrt(s_ / r_),
                 ang], -1)
            out = jnp.concatenate([obb5] + tail, axis=-1)
        else:
            out = jnp.concatenate([boxes.xysr2xyxy(x[:, :4])] + tail,
                                  axis=-1)

        new_state = SortState(
            x=x,
            P=P,
            ang=ang if cfg.is_obb else state.ang,
            active=active,
            tid=tid,
            conf=conf,
            cls=cls,
            det_ind=det_ind,
            hits=hits,
            tsu=tsu,
            age=age,
            next_id=next_id,
            frame_count=frame_count,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("sort")
class Sort(BaseTrackerWrapper):
    """Host-facing SORT with the reference's constructor signature
    (reference: sort.hpp:69-77; eval defaults motcpp_eval.cpp:99-111)."""

    def __init__(
        self,
        det_thresh: float = 0.3,
        max_age: int = 1,
        max_obs: int = 50,
        min_hits: int = 3,
        iou_threshold: float = 0.3,
        per_class: bool = False,
        nr_classes: int = 80,
        asso_func: str = "iou",
        is_obb: bool = False,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
    ):
        super().__init__(max_dets=max_dets)
        # SORT ignores asso_func and always uses IoU (reference:
        # sort.cpp:168-170); per_class kept for signature parity.
        del per_class, nr_classes, asso_func
        self._cfg_kw = dict(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self._build(is_obb)

    def _build(self, is_obb: bool):
        self.cfg = SortConfig(**self._cfg_kw, is_obb=is_obb)
        self._init, self._core_step = make_sort(self.cfg)
        self._jit_step = None

    def update(self, dets, img=None, embs=None, warp=None):
        import numpy as np

        # OBB autodetect (7-col first dets, like the reference's
        # setup_detection_format, tracker.cpp:174-183) rebuilds the core
        # in rotated-IoU mode — unlike the reference, whose OBB flow
        # degenerates (see SortConfig.is_obb)
        d = np.asarray(dets, np.float32)
        if (not self._first_dets_processed and d.size > 0
                and d.shape[1] == 7 and not self.cfg.is_obb):
            self._build(True)
            self._state = None
        return super().update(dets, img, embs, warp=warp)

    def _init_state(self):
        return self._init()

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask)
