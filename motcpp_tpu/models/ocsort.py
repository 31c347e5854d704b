"""OC-SORT — Observation-Centric SORT, TPU-native.

Functional re-design of the reference tracker (reference:
src/trackers/ocsort.cpp:53-738, include/motcpp/trackers/ocsort.hpp:88-102).
Per-track observation history becomes a fixed ring buffer tensor
(K, R, 5) keyed by the age at which each observation was recorded, so
``k_previous_obs`` is a static gather instead of a hash-map walk; the
velocity-direction-consistency cost and the OCR last-observation rematch
are masked broadcast ops + JV solves.

Replicated reference behaviors:
  * det split: high ``conf > det_thresh`` (strict), second
    ``min_conf < conf < det_thresh`` (ocsort.cpp:314-321)
  * predict clamps scale velocity when s + vs <= 0 (ocsort.cpp:134-136);
    NaN tracks pruned after predict (ocsort.cpp:354-363)
  * when no live tracks exist, births happen but NOTHING is emitted that
    frame (the early return at ocsort.cpp:366-383)
  * stage 1 cost -(IoU + angle_diff * inertia * det_conf) with the
    trivial one-to-one shortcut bypassing both LAP and the angle term
    (ocsort.cpp:681-714); matches post-filtered by IoU >= threshold
  * optional BYTE stage on predicted boxes, OCR rematch on last
    observations, both gated on ``max IoU > threshold``
    (ocsort.cpp:429-540)
  * unmatched tracks get a null update whose only effect is
    ``det_ind = 0`` (the C++ null-update quirk, ocsort.cpp:87-88,543-545)
  * output box is the last observation when one exists, else the KF
    state; emitted ids are ``id + 1``; gate ``tsu < 1 and
    (hit_streak >= min_hits or frame <= min_hits)`` (ocsort.cpp:562-587)
  * velocity direction = normalized (dy, dx) from k-frames-back
    observation (falling back to last observation) to the new box
    (ocsort.cpp:94-105, 160-171)
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.ops import boxes, select
from motcpp_tpu.ops.iou import get_asso_fn
from motcpp_tpu.ops.kalman.xysr import (
    DIM_X,
    XYSRParams,
    xysr_init,
    xysr_predict,
    xysr_update,
)
from motcpp_tpu.ops.lap import solve_lap_masked


@dataclasses.dataclass(frozen=True)
class OCSortConfig:
    """Reference defaults: ocsort.hpp:88-102."""

    det_thresh: float = 0.2
    max_age: int = 30
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    asso_func: str = "iou"
    min_conf: float = 0.1
    delta_t: int = 3
    inertia: float = 0.2
    use_byte: bool = False
    q_xy_scaling: float = 0.01
    q_s_scaling: float = 0.0001
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"
    frame_width: int = 1920
    frame_height: int = 1080

    @property
    def ring(self) -> int:
        return self.delta_t + 2


class OCSortState(NamedTuple):
    x: jnp.ndarray  # (K, 7)
    P: jnp.ndarray  # (K, 7, 7)
    active: jnp.ndarray  # (K,) bool
    tid: jnp.ndarray  # (K,) int32 (0-based; output emits tid + 1)
    age: jnp.ndarray  # (K,) int32 — predicts since birth
    hits: jnp.ndarray
    hit_streak: jnp.ndarray
    tsu: jnp.ndarray  # time_since_update
    conf: jnp.ndarray
    cls: jnp.ndarray
    det_ind: jnp.ndarray
    last_obs: jnp.ndarray  # (K, 5) [x1, y1, x2, y2, conf]; -1 sentinel
    velocity: jnp.ndarray  # (K, 2) (dy, dx)
    obs_ring: jnp.ndarray  # (K, R, 5)
    obs_age: jnp.ndarray  # (K, R) int32, -10**6 sentinel
    obs_ptr: jnp.ndarray  # (K,) int32 ring write pointer
    next_id: jnp.ndarray  # ()
    frame_count: jnp.ndarray  # ()


_NO_AGE = -(10**6)


def _speed_direction(box_from, box_to):
    """Normalized (dy, dx) between box centers (ocsort.cpp:160-171)."""
    cx1 = (box_from[..., 0] + box_from[..., 2]) * 0.5
    cy1 = (box_from[..., 1] + box_from[..., 3]) * 0.5
    cx2 = (box_to[..., 0] + box_to[..., 2]) * 0.5
    cy2 = (box_to[..., 1] + box_to[..., 3]) * 0.5
    dy = cy2 - cy1
    dx = cx2 - cx1
    norm = jnp.sqrt(dy * dy + dx * dx) + 1e-6
    return jnp.stack([dy / norm, dx / norm], axis=-1)


_WIN_PRIORITY = jnp.int32(2**30)


def _k_previous_obs(obs_ring, obs_age, age, delta_t):
    """Vectorized k_previous_obs (ocsort.cpp:24-51): try ages
    age-delta_t .. age-1 in order, else the newest recorded observation,
    else the -1 placeholder.

    Single-pass form: ring ages are unique per track (one observation
    per frame age), so "oldest age inside the window, else newest
    overall" is one priority argmax + one gather instead of delta_t+1
    argmax/gather sweeps. Value-exact vs the sequential search.
    """
    has_any = jnp.any(obs_age > _NO_AGE, axis=1)  # (K,)
    dt = age[:, None] - obs_age  # (K, R); _NO_AGE slots -> huge dt
    in_window = (dt >= 1) & (dt <= delta_t)
    # in-window: older (larger dt) wins, and any window hit outranks the
    # newest-observation fallback (scored by raw age, < 2**30)
    score = jnp.where(in_window, _WIN_PRIORITY + dt, obs_age)
    slot = jnp.argmax(score, axis=1)  # (K,)
    result = jnp.take_along_axis(obs_ring, slot[:, None, None], axis=1)[
        :, 0, :
    ]
    return jnp.where(has_any[:, None], result, -1.0)  # (K, 5)


def _gated_greedy_or_lap(iou_mat, row_mask, col_mask, thresh):
    """Stage-1 match core shared with DeepOC-SORT relatives: returns the
    *trivial* one-to-one matching when each row/col has at most one
    candidate above threshold (ocsort.cpp:684-696)."""
    masked = jnp.where(row_mask[:, None] & col_mask[None, :], iou_mat, 0.0)
    cand = masked > thresh
    row_sums = jnp.sum(cand, axis=1)
    col_sums = jnp.sum(cand, axis=0)
    trivial = (jnp.max(row_sums, initial=0) <= 1) & (
        jnp.max(col_sums, initial=0) <= 1
    )
    d2t_trivial = jnp.where(
        row_sums == 1, jnp.argmax(cand, axis=1).astype(jnp.int32), -1
    )
    return trivial, d2t_trivial


def make_ocsort(cfg: OCSortConfig):
    K = cfg.max_tracks
    R = cfg.ring
    kf = XYSRParams(q_xy_scaling=cfg.q_xy_scaling, q_s_scaling=cfg.q_s_scaling)
    asso = get_asso_fn(cfg.asso_func, cfg.frame_width, cfg.frame_height)

    def init_fn() -> OCSortState:
        return OCSortState(
            x=jnp.zeros((K, DIM_X), jnp.float32),
            P=jnp.broadcast_to(jnp.eye(DIM_X), (K, DIM_X, DIM_X)).astype(
                jnp.float32
            ),
            active=jnp.zeros((K,), bool),
            tid=jnp.zeros((K,), jnp.int32),
            age=jnp.zeros((K,), jnp.int32),
            hits=jnp.zeros((K,), jnp.int32),
            hit_streak=jnp.zeros((K,), jnp.int32),
            tsu=jnp.zeros((K,), jnp.int32),
            conf=jnp.zeros((K,), jnp.float32),
            cls=jnp.zeros((K,), jnp.float32),
            det_ind=jnp.full((K,), -1, jnp.int32),
            last_obs=jnp.full((K, 5), -1.0, jnp.float32),
            velocity=jnp.zeros((K, 2), jnp.float32),
            obs_ring=jnp.full((K, R, 5), -1.0, jnp.float32),
            obs_age=jnp.full((K, R), _NO_AGE, jnp.int32),
            obs_ptr=jnp.zeros((K,), jnp.int32),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def _apply_track_update(st_vars, match_t2d, dets, frame_age):
        """Full observation update for tracks matched to a det
        (ocsort.cpp:87-130), batched over K with a match map."""
        (x, P, conf, cls, det_ind, last_obs, velocity, obs_ring, obs_age,
         obs_ptr, tsu, hits, hit_streak) = st_vars
        N = dets.shape[0]
        m = match_t2d >= 0
        j = jnp.clip(match_t2d, 0, N - 1)
        drow = dets[j]
        dbox = drow[:, :4]

        # velocity from k-back (or last) observation to the new box
        has_prev = jnp.sum(last_obs[:, :4], axis=1) >= 0
        k_prev = _k_previous_obs(obs_ring, obs_age, frame_age, cfg.delta_t)
        k_valid = jnp.sum(k_prev[:, :4], axis=1) >= 0
        ref_box = jnp.where(k_valid[:, None], k_prev[:, :4], last_obs[:, :4])
        new_vel = _speed_direction(ref_box, dbox)
        velocity = jnp.where((m & has_prev)[:, None], new_vel, velocity)

        # record observation in the ring
        new_obs = jnp.concatenate([dbox, drow[:, 4:5]], axis=-1)
        slot = obs_ptr % R
        obs_ring = select.write_slot(obs_ring, slot, new_obs, m)
        obs_age = select.write_slot_scalar(obs_age, slot, frame_age, m)
        obs_ptr = jnp.where(m, obs_ptr + 1, obs_ptr)
        last_obs = jnp.where(m[:, None], new_obs, last_obs)

        tsu = jnp.where(m, 0, tsu)
        hits = jnp.where(m, hits + 1, hits)
        hit_streak = jnp.where(m, hit_streak + 1, hit_streak)
        conf = jnp.where(m, drow[:, 4], conf)
        cls = jnp.where(m, drow[:, 5], cls)
        det_ind = jnp.where(m, j, det_ind)

        z = boxes.xyxy2xysr(dbox)
        ux, uP = xysr_update(x, P, z, kf)
        x = jnp.where(m[:, None], ux, x)
        P = jnp.where(m[:, None, None], uP, P)
        return (x, P, conf, cls, det_ind, last_obs, velocity, obs_ring,
                obs_age, obs_ptr, tsu, hits, hit_streak)

    def step_fn(state: OCSortState, dets, det_mask, embs=None):
        del embs
        N = dets.shape[0]
        frame = state.frame_count + 1
        det_conf = dets[:, 4]
        det_xyxy = dets[:, :4]

        high = det_mask & (det_conf > cfg.det_thresh)
        second = det_mask & (det_conf > cfg.min_conf) & (
            det_conf < cfg.det_thresh
        )

        # --- predict (scale-velocity clamp, ocsort.cpp:132-144) ----------
        x = state.x
        clamp = (state.x[:, 6] + state.x[:, 2]) <= 0
        x = x.at[:, 6].set(jnp.where(clamp, 0.0, x[:, 6]))
        px, pP = xysr_predict(x, state.P, kf)
        x = jnp.where(state.active[:, None], px, state.x)
        P = jnp.where(state.active[:, None, None], pP, state.P)
        age = jnp.where(state.active, state.age + 1, state.age)
        hit_streak = jnp.where(
            state.active & (state.tsu > 0), 0, state.hit_streak
        )
        tsu = jnp.where(state.active, state.tsu + 1, state.tsu)

        trk_xyxy = boxes.xysr2xyxy(x[:, :4])
        finite = jnp.all(jnp.isfinite(trk_xyxy), axis=-1)
        active = state.active & finite
        had_tracks = jnp.any(active)

        # --- stage 1: velocity-direction-consistency association ---------
        k_obs = _k_previous_obs(state.obs_ring, state.obs_age, age, cfg.delta_t)
        iou_mat = asso(det_xyxy, trk_xyxy)  # (N, K) dets x trks
        # direction from each track's previous obs to each det
        dcx = (det_xyxy[:, 0] + det_xyxy[:, 2])[:, None] * 0.5
        dcy = (det_xyxy[:, 1] + det_xyxy[:, 3])[:, None] * 0.5
        pcx = ((k_obs[:, 0] + k_obs[:, 2]) * 0.5)[None, :]
        pcy = ((k_obs[:, 1] + k_obs[:, 3]) * 0.5)[None, :]
        dx = dcx - pcx
        dy = dcy - pcy
        norm = jnp.sqrt(dx * dx + dy * dy) + 1e-6
        Yd = dy / norm  # (N, K)
        Xd = dx / norm
        cos = jnp.clip(
            state.velocity[None, :, 1] * Xd + state.velocity[None, :, 0] * Yd,
            -1.0,
            1.0,
        )
        diff_angle = (math.pi / 2.0 - jnp.abs(jnp.arccos(cos))) / math.pi
        valid_prev = (k_obs[:, 4] >= 0)[None, :]  # (1, K)
        angle_cost = (
            jnp.where(valid_prev, diff_angle, 0.0)
            * cfg.inertia
            * det_conf[:, None]
        )

        trivial, d2t_trivial = _gated_greedy_or_lap(
            iou_mat, high, active, cfg.iou_threshold
        )
        cost1 = -(iou_mat + angle_cost)
        d2t_lap, _ = solve_lap_masked(
            cost1, high, active, -cfg.iou_threshold, impl=cfg.lap_impl
        )
        # post-filter: matched pairs must clear the raw-IoU threshold
        lap_iou = select.take_per_row(iou_mat, d2t_lap)
        d2t_lap = jnp.where(
            (d2t_lap >= 0) & (lap_iou >= cfg.iou_threshold), d2t_lap, -1
        )
        d2t = jnp.where(trivial, d2t_trivial, d2t_lap)
        # invert to track side
        t2d = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(d2t >= 0, d2t, K)
        ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")

        # NOTE: commits are deferred — the BYTE and OCR stages below only
        # read state on rows stage 1 leaves unmatched (their row/col
        # masks exclude every already-matched track), so all stages'
        # observation updates merge into ONE batched
        # _apply_track_update at the end, bit-exact vs sequential
        # application (each track row is matched by at most one stage).
        st_vars = (x, P, state.conf, state.cls, state.det_ind, state.last_obs,
                   state.velocity, state.obs_ring, state.obs_age,
                   state.obs_ptr, tsu, state.hits, hit_streak)
        t2d_all = t2d

        u_trk = active & (t2d < 0)
        u_det = high & (d2t < 0)

        # --- BYTE stage (ocsort.cpp:429-472) -----------------------------
        if cfg.use_byte:
            iou2 = asso(det_xyxy, trk_xyxy)  # second dets x predicted trks
            masked2 = jnp.where(
                second[:, None] & u_trk[None, :], iou2, -jnp.inf
            )
            gate2 = (
                jnp.any(second)
                & jnp.any(u_trk)
                & (jnp.max(masked2, initial=-jnp.inf) > cfg.iou_threshold)
            )
            d2t_2, _ = solve_lap_masked(
                -iou2, second & gate2, u_trk & gate2, -cfg.iou_threshold,
                impl=cfg.lap_impl,
            )
            iou2_sel = select.take_per_row(iou2, d2t_2)
            d2t_2 = jnp.where(
                (d2t_2 >= 0) & (iou2_sel >= cfg.iou_threshold), d2t_2, -1
            )
            t2d_2 = jnp.full((K,), -1, jnp.int32).at[
                jnp.where(d2t_2 >= 0, d2t_2, K)
            ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
            t2d_all = jnp.where(t2d_all >= 0, t2d_all, t2d_2)
            u_trk = u_trk & (t2d_2 < 0)

        # --- OCR rematch on last observations (ocsort.cpp:474-540) -------
        # pre-update last_obs: identical on every u_trk column (earlier
        # stages never wrote unmatched rows); matched columns are masked
        obs_boxes = state.last_obs[:, :4]
        iou3 = asso(det_xyxy, obs_boxes)
        masked3 = jnp.where(u_det[:, None] & u_trk[None, :], iou3, -jnp.inf)
        gate3 = (
            jnp.any(u_det)
            & jnp.any(u_trk)
            & (jnp.max(masked3, initial=-jnp.inf) > cfg.iou_threshold)
        )
        d2t_3, _ = solve_lap_masked(
            -iou3, u_det & gate3, u_trk & gate3, -cfg.iou_threshold,
            impl=cfg.lap_impl,
        )
        iou3_sel = select.take_per_row(iou3, d2t_3)
        d2t_3 = jnp.where(
            (d2t_3 >= 0) & (iou3_sel >= cfg.iou_threshold), d2t_3, -1
        )
        t2d_3 = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(d2t_3 >= 0, d2t_3, K)
        ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        t2d_all = jnp.where(t2d_all >= 0, t2d_all, t2d_3)
        st_vars = _apply_track_update(st_vars, t2d_all, dets, age)
        u_trk = u_trk & (t2d_3 < 0)
        u_det = u_det & (d2t_3 < 0)

        (x, P, conf, cls, det_ind, last_obs, velocity, obs_ring, obs_age,
         obs_ptr, tsu, hits, hit_streak) = st_vars

        # --- null update: det_ind = 0 quirk (ocsort.cpp:543-545, 87-88) --
        det_ind = jnp.where(u_trk, 0, det_ind)

        # --- births -------------------------------------------------------
        free = ~active
        n_new = jnp.sum(u_det.astype(jnp.int32))
        births, bdet, slot_rank = select.birth_slots(free, u_det)
        brow = dets[bdet]
        bx, bP = xysr_init(boxes.xyxy2xysr(brow[:, :4]), kf)
        x = jnp.where(births[:, None], bx, x)
        P = jnp.where(births[:, None, None], bP, P)
        conf = jnp.where(births, brow[:, 4], conf)
        cls = jnp.where(births, brow[:, 5], cls)
        det_ind = jnp.where(births, bdet, det_ind)
        age = jnp.where(births, 0, age)
        hits = jnp.where(births, 0, hits)
        hit_streak = jnp.where(births, 0, hit_streak)
        tsu = jnp.where(births, 0, tsu)
        last_obs = jnp.where(births[:, None], -1.0, last_obs)
        velocity = jnp.where(births[:, None], 0.0, velocity)
        obs_ring = jnp.where(births[:, None, None], -1.0, obs_ring)
        obs_age = jnp.where(births[:, None], _NO_AGE, obs_age)
        obs_ptr = jnp.where(births, 0, obs_ptr)
        # internal ids start at 1 (ocsort.hpp:32-35 returns ++count)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            n_new, jnp.sum(free.astype(jnp.int32))
        )
        active = active | births

        # --- output (suppressed when no tracks pre-existed,
        #     ocsort.cpp:366-383) ------------------------------------------
        obs_valid = jnp.sum(last_obs[:, :4], axis=1) >= 0
        out_box = jnp.where(
            obs_valid[:, None], last_obs[:, :4], boxes.xysr2xyxy(x[:, :4])
        )
        # births are in active_tracks_ before the output loop runs
        # (ocsort.cpp:548-556 vs :562): tsu=0, hit_streak=0 emits them
        # only while frame <= min_hits
        out_mask = (
            had_tracks
            & active
            & (tsu < 1)
            & ((hit_streak >= cfg.min_hits) | (frame <= cfg.min_hits))
        )
        out = jnp.concatenate(
            [
                out_box,
                (tid + 1)[:, None].astype(jnp.float32),
                conf[:, None],
                cls[:, None],
                det_ind[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )

        # --- deaths -------------------------------------------------------
        active = active & (tsu <= cfg.max_age)

        new_state = OCSortState(
            x=x, P=P, active=active, tid=tid, age=age, hits=hits,
            hit_streak=hit_streak, tsu=tsu, conf=conf, cls=cls,
            det_ind=det_ind, last_obs=last_obs, velocity=velocity,
            obs_ring=obs_ring, obs_age=obs_age, obs_ptr=obs_ptr,
            next_id=next_id, frame_count=frame,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("ocsort")
class OCSort(BaseTrackerWrapper):
    """Host-facing OC-SORT (reference: ocsort.hpp:88-102 defaults; eval
    construction motcpp_eval.cpp:149-166)."""

    def __init__(
        self,
        det_thresh: float = 0.2,
        max_age: int = 30,
        max_obs: int = 50,
        min_hits: int = 3,
        iou_threshold: float = 0.3,
        per_class: bool = False,
        nr_classes: int = 80,
        asso_func: str = "iou",
        is_obb: bool = False,
        min_conf: float = 0.1,
        delta_t: int = 3,
        inertia: float = 0.2,
        use_byte: bool = False,
        Q_xy_scaling: float = 0.01,
        Q_s_scaling: float = 0.0001,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
    ):
        super().__init__(max_dets=max_dets)
        del per_class, nr_classes, is_obb
        self._cfg_kw = dict(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            asso_func=asso_func,
            min_conf=min_conf,
            delta_t=delta_t,
            inertia=inertia,
            use_byte=use_byte,
            q_xy_scaling=Q_xy_scaling,
            q_s_scaling=Q_s_scaling,
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self.cfg = OCSortConfig(**self._cfg_kw)
        self._init, self._core_step = make_ocsort(self.cfg)

    def _setup_first_frame(self, dets, img):
        # centroid asso functions need the true frame size
        refresh = not self._first_frame_processed and img is not None
        super()._setup_first_frame(dets, img)
        if refresh and self.cfg.asso_func.startswith("centroid"):
            self.cfg = OCSortConfig(
                **self._cfg_kw,
                frame_width=self.frame_width,
                frame_height=self.frame_height,
            )
            self._init, self._core_step = make_ocsort(self.cfg)
            self._jit_step = None

    def _init_state(self):
        return self._init()

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask)
