"""DeepOC-SORT — OC-SORT + appearance embeddings, TPU-native.

Functional re-design of the reference tracker (reference:
src/trackers/deepocsort.cpp:50-944). Builds on the OC-SORT slot design
(observation ring, velocity-direction cost) and adds:

  * per-track EMA embeddings with per-detection dynamic alpha
    ``alpha = a_fixed + (1 - a_fixed) * (1 - trust)``,
    ``trust = (conf - det_thresh) / (1 - det_thresh)``
    (deepocsort.cpp:650-653), renormalized after every EMA step
    (deepocsort.cpp:143-161)
  * stage-1 cost ``-(IoU + angle + emb)`` where emb = dets_embs @
    trk_embs^T, zeroed where IoU <= 0, scaled by the *adaptive weight*
    top-2-gap metric per row and column (compute_aw_max_metric,
    deepocsort.cpp:294-348) unless ``aw_off``
  * camera-motion compensation hook: a per-frame affine (2, 3) warp is
    applied to every track's KF state before predict
    (deepocsort.cpp:637-648; warp computed by motion.cmc.SOF or
    injected precomputed — ``cmc_off`` skips)
  * OCR rematch on last observations using plain IoU (the reference
    computes an embedding cost there but never uses it,
    deepocsort.cpp:826-842) — matched tracks also EMA their embedding
  * NO low-confidence second stage; dets filtered by conf > det_thresh
  * output ids without the +1 of OC-SORT (deepocsort.cpp:913)

Fixed-shape note: the adaptive-weight top-2 statistics run over masked
slots with -inf padding; when fewer than 2 real rows/cols exist the
weight stays at w_assoc_emb, matching the reference's early-continue.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.models.ocsort import (
    _NO_AGE,
    _gated_greedy_or_lap,
    _k_previous_obs,
    _speed_direction,
)
from motcpp_tpu.ops import boxes
from motcpp_tpu.ops.iou import get_asso_fn
from motcpp_tpu.ops.kalman.xysr import (
    DIM_X,
    XYSRParams,
    xysr_apply_affine,
    xysr_init,
    xysr_predict,
    xysr_update,
)
from motcpp_tpu.ops.lap import solve_lap_masked


@dataclasses.dataclass(frozen=True)
class DeepOCSortConfig:
    """Reference defaults (deepocsort.cpp:507-541, deepocsort.yaml)."""

    det_thresh: float = 0.3
    max_age: int = 30
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    asso_func: str = "iou"
    delta_t: int = 3
    inertia: float = 0.2
    w_association_emb: float = 0.5
    alpha_fixed_emb: float = 0.95
    aw_param: float = 0.5
    embedding_off: bool = False
    cmc_off: bool = False
    aw_off: bool = False
    q_xy_scaling: float = 0.01
    q_s_scaling: float = 0.0001
    emb_dim: int = 1
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"
    frame_width: int = 1920
    frame_height: int = 1080

    @property
    def ring(self) -> int:
        return self.delta_t + 2


class DeepOCState(NamedTuple):
    x: jnp.ndarray
    P: jnp.ndarray
    active: jnp.ndarray
    tid: jnp.ndarray
    age: jnp.ndarray
    hits: jnp.ndarray
    hit_streak: jnp.ndarray
    tsu: jnp.ndarray
    conf: jnp.ndarray
    cls: jnp.ndarray
    det_ind: jnp.ndarray
    last_obs: jnp.ndarray
    velocity: jnp.ndarray
    obs_ring: jnp.ndarray
    obs_age: jnp.ndarray
    obs_ptr: jnp.ndarray
    emb: jnp.ndarray  # (K, D) L2-normalized EMA appearance
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


def compute_aw_max_metric(emb_cost, row_mask, col_mask, w_assoc_emb, bottom):
    """Adaptive embedding weight via top-2 gap per row and column
    (reference: deepocsort.cpp:294-348), mask-aware."""
    NEG = -jnp.inf
    valid = row_mask[:, None] & col_mask[None, :]
    e = jnp.where(valid, emb_cost, NEG)

    def weights(mat, count):
        mx = jnp.max(mat, axis=1)
        arg = jnp.argmax(mat, axis=1)
        second = jnp.max(
            mat.at[jnp.arange(mat.shape[0]), arg].set(NEG), axis=1
        )
        safe_mx = jnp.where((mx != 0.0) & jnp.isfinite(mx), mx, 1.0)
        ratio = jnp.where(jnp.isfinite(second), second / safe_mx, 0.0)
        w = 1.0 - jnp.maximum(ratio - bottom, 0.0) / (1.0 - bottom)
        w = jnp.where(mx == 0.0, 0.0, w)
        w = jnp.where(jnp.isfinite(mx), w, 0.0)  # fully-masked line
        # fewer than 2 candidates: keep full weight (reference continue)
        return jnp.where(count < 2, 1.0, w)

    n_cols = jnp.sum(col_mask.astype(jnp.int32))
    n_rows = jnp.sum(row_mask.astype(jnp.int32))
    w_row = weights(e, n_cols)  # (N,)
    w_col = weights(e.T, n_rows)  # (K,)
    w = w_assoc_emb * w_row[:, None] * w_col[None, :]
    return w * jnp.where(valid, emb_cost, 0.0)


def make_deepocsort(cfg: DeepOCSortConfig):
    K = cfg.max_tracks
    R = cfg.ring
    D = cfg.emb_dim
    kf = XYSRParams(q_xy_scaling=cfg.q_xy_scaling, q_s_scaling=cfg.q_s_scaling)
    asso = get_asso_fn(cfg.asso_func, cfg.frame_width, cfg.frame_height)

    def init_fn() -> DeepOCState:
        return DeepOCState(
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
            emb=jnp.ones((K, D), jnp.float32),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def _track_update(vars_, t2d, dets, dets_emb, dets_alpha, frame_age):
        """Observation + embedding update for matched tracks
        (deepocsort.cpp:96-161)."""
        (x, P, conf, cls, det_ind, last_obs, velocity, obs_ring, obs_age,
         obs_ptr, tsu, hits, hit_streak, emb) = vars_
        N = dets.shape[0]
        m = t2d >= 0
        j = jnp.clip(t2d, 0, N - 1)
        drow = dets[j]
        dbox = drow[:, :4]

        has_prev = jnp.sum(last_obs[:, :4], axis=1) >= 0
        k_prev = _k_previous_obs(obs_ring, obs_age, frame_age, cfg.delta_t)
        k_valid = jnp.sum(k_prev[:, :4], axis=1) >= 0
        ref_box = jnp.where(k_valid[:, None], k_prev[:, :4], last_obs[:, :4])
        new_vel = _speed_direction(ref_box, dbox)
        velocity = jnp.where((m & has_prev)[:, None], new_vel, velocity)

        new_obs = jnp.concatenate([dbox, drow[:, 4:5]], axis=-1)
        slot = obs_ptr % R
        obs_ring = jnp.where(
            m[:, None, None],
            obs_ring.at[jnp.arange(K), slot].set(new_obs),
            obs_ring,
        )
        obs_age = jnp.where(
            m[:, None], obs_age.at[jnp.arange(K), slot].set(frame_age), obs_age
        )
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

        # EMA + renorm (deepocsort.cpp:143-161)
        alpha = dets_alpha[j][:, None]
        new_emb = alpha * emb + (1.0 - alpha) * dets_emb[j]
        norm = jnp.linalg.norm(new_emb, axis=-1, keepdims=True)
        new_emb = new_emb / jnp.where(norm > 0, norm, 1.0)
        emb = jnp.where(m[:, None], new_emb, emb)

        return (x, P, conf, cls, det_ind, last_obs, velocity, obs_ring,
                obs_age, obs_ptr, tsu, hits, hit_streak, emb)

    def step_fn(state: DeepOCState, dets, det_mask, embs=None, warp=None):
        """One frame. embs (N, D) det embeddings (ignored when
        embedding_off); warp optional (2, 3) CMC affine."""
        N = dets.shape[0]
        frame = state.frame_count + 1
        det_conf = dets[:, 4]
        det_xyxy = dets[:, :4]

        high = det_mask & (det_conf > cfg.det_thresh)
        if cfg.embedding_off or embs is None:
            dets_emb = jnp.ones((N, D), jnp.float32)
        else:
            dets_emb = embs[:, :D]

        # dynamic EMA alpha (deepocsort.cpp:650-653)
        trust = (det_conf - cfg.det_thresh) / (1.0 - cfg.det_thresh)
        dets_alpha = cfg.alpha_fixed_emb + (1.0 - cfg.alpha_fixed_emb) * (
            1.0 - trust
        )

        # --- CMC before predict (deepocsort.cpp:637-648) -----------------
        x, P = state.x, state.P
        if not cfg.cmc_off and warp is not None:
            mw = warp[:, :2]
            tw = warp[:, 2]
            wx, wP = xysr_apply_affine(x, P, mw, tw)
            x = jnp.where(state.active[:, None], wx, x)
            P = jnp.where(state.active[:, None, None], wP, P)

        # --- predict with scale clamp ------------------------------------
        clamp = (x[:, 6] + x[:, 2]) <= 0
        x = x.at[:, 6].set(jnp.where(clamp, 0.0, x[:, 6]))
        px, pP = xysr_predict(x, P, kf)
        x = jnp.where(state.active[:, None], px, x)
        P = jnp.where(state.active[:, None, None], pP, P)
        age = jnp.where(state.active, state.age + 1, state.age)
        hit_streak = jnp.where(
            state.active & (state.tsu > 0), 0, state.hit_streak
        )
        tsu = jnp.where(state.active, state.tsu + 1, state.tsu)

        trk_xyxy = boxes.xysr2xyxy(x[:, :4])
        finite = jnp.all(jnp.isfinite(trk_xyxy), axis=-1)
        active = state.active & finite
        had_tracks = jnp.any(active)

        # --- stage 1: IoU + angle + adaptive embedding -------------------
        k_obs = _k_previous_obs(state.obs_ring, state.obs_age, age, cfg.delta_t)
        iou_mat = asso(det_xyxy, trk_xyxy)  # (N, K)
        dcx = (det_xyxy[:, 0] + det_xyxy[:, 2])[:, None] * 0.5
        dcy = (det_xyxy[:, 1] + det_xyxy[:, 3])[:, None] * 0.5
        pcx = ((k_obs[:, 0] + k_obs[:, 2]) * 0.5)[None, :]
        pcy = ((k_obs[:, 1] + k_obs[:, 3]) * 0.5)[None, :]
        dx = dcx - pcx
        dy = dcy - pcy
        norm = jnp.sqrt(dx * dx + dy * dy) + 1e-6
        cos = jnp.clip(
            state.velocity[None, :, 1] * (dx / norm)
            + state.velocity[None, :, 0] * (dy / norm),
            -1.0,
            1.0,
        )
        diff_angle = (math.pi / 2.0 - jnp.abs(jnp.arccos(cos))) / math.pi
        valid_prev = (k_obs[:, 4] >= 0)[None, :]
        angle_cost = (
            jnp.where(valid_prev, diff_angle, 0.0)
            * cfg.inertia
            * det_conf[:, None]
        )

        emb_raw = dets_emb @ state.emb.T  # (N, K) cosine (inputs normed)
        emb_raw = jnp.where(iou_mat <= 0.0, 0.0, emb_raw)
        if cfg.embedding_off:
            emb_cost = jnp.zeros_like(emb_raw)
        elif cfg.aw_off:
            emb_cost = jnp.where(
                high[:, None] & active[None, :], emb_raw, 0.0
            ) * cfg.w_association_emb
        else:
            emb_cost = compute_aw_max_metric(
                emb_raw, high, active, cfg.w_association_emb, cfg.aw_param
            )

        trivial, d2t_trivial = _gated_greedy_or_lap(
            iou_mat, high, active, cfg.iou_threshold
        )
        cost1 = -(iou_mat + angle_cost + emb_cost)
        d2t_lap, _ = solve_lap_masked(
            cost1, high, active, -cfg.iou_threshold, impl=cfg.lap_impl
        )
        lap_iou = jnp.take_along_axis(
            iou_mat, jnp.clip(d2t_lap, 0, K - 1)[:, None], axis=1
        )[:, 0]
        d2t_lap = jnp.where(
            (d2t_lap >= 0) & (lap_iou >= cfg.iou_threshold), d2t_lap, -1
        )
        d2t = jnp.where(trivial, d2t_trivial, d2t_lap)
        t2d = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(d2t >= 0, d2t, K)
        ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")

        # commits deferred: OCR below only reads rows stage 1 left
        # unmatched, so both stages' updates merge into ONE batched
        # _track_update (bit-exact — each row matched by at most one
        # stage; see the same pattern in ocsort.py/bytetrack.py)
        vars_ = (x, P, state.conf, state.cls, state.det_ind, state.last_obs,
                 state.velocity, state.obs_ring, state.obs_age, state.obs_ptr,
                 tsu, state.hits, hit_streak, state.emb)

        u_trk = active & (t2d < 0)
        u_det = high & (d2t < 0)

        # --- OCR rematch (plain IoU; deepocsort.cpp:800-876) -------------
        # pre-update last_obs: identical on every u_trk column; matched
        # columns are masked out of the gate, the solve and the filter
        iou3 = asso(det_xyxy, state.last_obs[:, :4])
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
        iou3_sel = jnp.take_along_axis(
            iou3, jnp.clip(d2t_3, 0, K - 1)[:, None], axis=1
        )[:, 0]
        d2t_3 = jnp.where(
            (d2t_3 >= 0) & (iou3_sel >= cfg.iou_threshold), d2t_3, -1
        )
        t2d_3 = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(d2t_3 >= 0, d2t_3, K)
        ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        t2d_all = jnp.where(t2d >= 0, t2d, t2d_3)
        vars_ = _track_update(vars_, t2d_all, dets, dets_emb, dets_alpha, age)
        u_trk = u_trk & (t2d_3 < 0)
        u_det = u_det & (d2t_3 < 0)

        (x, P, conf, cls, det_ind, last_obs, velocity, obs_ring, obs_age,
         obs_ptr, tsu, hits, hit_streak, emb) = vars_

        # null update quirk (deepocsort.cpp:96-97 before the size check)
        det_ind = jnp.where(u_trk, 0, det_ind)

        # --- births -------------------------------------------------------
        free = ~active
        det_rank = jnp.cumsum(u_det.astype(jnp.int32)) - 1
        slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        n_new = jnp.sum(u_det.astype(jnp.int32))
        pos_by_rank = (
            jnp.full((K,), N, jnp.int32)
            .at[jnp.where(u_det, det_rank, K)]
            .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        )
        births = free & (slot_rank < n_new)
        bdet = jnp.where(births, pos_by_rank[jnp.clip(slot_rank, 0, K - 1)], 0)
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
        emb = jnp.where(births[:, None], dets_emb[bdet], emb)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            n_new, jnp.sum(free.astype(jnp.int32))
        )
        active = active | births

        # --- output (id WITHOUT +1, deepocsort.cpp:913) ------------------
        obs_valid = jnp.sum(last_obs[:, :4], axis=1) >= 0
        out_box = jnp.where(
            obs_valid[:, None], last_obs[:, :4], boxes.xysr2xyxy(x[:, :4])
        )
        out_mask = (
            had_tracks
            & active
            & (tsu < 1)
            & ((hit_streak >= cfg.min_hits) | (frame <= cfg.min_hits))
        )
        out = jnp.concatenate(
            [
                out_box,
                tid[:, None].astype(jnp.float32),
                conf[:, None],
                cls[:, None],
                det_ind[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )

        active = active & (tsu <= cfg.max_age)

        new_state = DeepOCState(
            x=x, P=P, active=active, tid=tid, age=age, hits=hits,
            hit_streak=hit_streak, tsu=tsu, conf=conf, cls=cls,
            det_ind=det_ind, last_obs=last_obs, velocity=velocity,
            obs_ring=obs_ring, obs_age=obs_age, obs_ptr=obs_ptr, emb=emb,
            next_id=next_id, frame_count=frame,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("deepocsort")
class DeepOCSort(BaseTrackerWrapper):
    """Host-facing DeepOC-SORT (reference: deepocsort.cpp:507-541).

    Embeddings come from ``update(dets, img, embs)`` (pre-generated, like
    the reference eval path) or from the on-device ReID backend
    (appearance.reid) when constructed with reid weights. CMC warps are
    computed host-side by motion.cmc.SOF unless ``cmc_off``.
    """

    def __init__(
        self,
        reid_weights: str = "",
        use_half: bool = False,
        use_gpu: bool = False,
        det_thresh: float = 0.3,
        max_age: int = 30,
        max_obs: int = 50,
        min_hits: int = 3,
        iou_threshold: float = 0.3,
        per_class: bool = False,
        nr_classes: int = 80,
        asso_func: str = "iou",
        is_obb: bool = False,
        delta_t: int = 3,
        inertia: float = 0.2,
        w_association_emb: float = 0.5,
        alpha_fixed_emb: float = 0.95,
        aw_param: float = 0.5,
        embedding_off: bool = False,
        cmc_off: bool = False,
        aw_off: bool = False,
        Q_xy_scaling: float = 0.01,
        Q_s_scaling: float = 0.0001,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
        emb_dim: int = 1,
    ):
        super().__init__(max_dets=max_dets, emb_dim=emb_dim)
        del per_class, nr_classes, is_obb, use_half, use_gpu
        self._cfg_kw = dict(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            asso_func=asso_func,
            delta_t=delta_t,
            inertia=inertia,
            w_association_emb=w_association_emb,
            alpha_fixed_emb=alpha_fixed_emb,
            aw_param=aw_param,
            embedding_off=embedding_off,
            cmc_off=cmc_off,
            aw_off=aw_off,
            q_xy_scaling=Q_xy_scaling,
            q_s_scaling=Q_s_scaling,
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self.reid_weights = reid_weights
        self._reid = None
        self._cmc = None
        self._build(emb_dim)

    def _build(self, emb_dim: int):
        self.cfg = DeepOCSortConfig(**self._cfg_kw, emb_dim=emb_dim)
        self._init, self._core_step = make_deepocsort(self.cfg)
        self._jit_step = None

    def update(self, dets, img=None, embs=None, warp=None):
        import numpy as np

        embs_arr = None if embs is None else np.asarray(embs, np.float32)
        if (
            embs_arr is not None
            and embs_arr.size > 0
            and embs_arr.shape[1] != self.cfg.emb_dim
        ):
            self.emb_dim = embs_arr.shape[1]
            state = self._state
            self._build(embs_arr.shape[1])
            if state is not None:
                # restart tracks with the new embedding dimension
                self._state = None
        if (
            (embs_arr is None or embs_arr.size == 0)
            and not self.cfg.embedding_off
            and self.reid_weights
            and img is not None
            and np.asarray(dets).shape[0] > 0
        ):
            embs_arr = self._reid_features(np.asarray(dets, np.float32), img)
            if embs_arr is not None and embs_arr.shape[1] != self.cfg.emb_dim:
                self.emb_dim = embs_arr.shape[1]
                self._build(embs_arr.shape[1])
        return super().update(dets, img, embs_arr, warp=warp)

    def _compute_warp(self, img, dets):
        if self.cfg.cmc_off or img is None or dets.shape[0] == 0:
            return None
        if self._cmc is None:
            from motcpp_tpu.motion.cmc import SOF

            self._cmc = SOF(scale=0.15)  # deepocsort.cpp:553-556
        return self._cmc.apply(img, dets)

    def _reid_features(self, dets, img):
        if self._reid is None:
            from motcpp_tpu.appearance.reid import ReIDBackend

            self._reid = ReIDBackend(self.reid_weights)
        return self._reid.get_features(dets[:, :4], img)

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask, embs, warp=warp)

    def _init_state(self):
        return self._init()
