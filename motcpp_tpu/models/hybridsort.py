"""HybridSORT — score-in-state Kalman + TCM score costs, TPU-native.

Functional re-design of the reference tracker (reference:
src/trackers/hybridsort.cpp:26-1258, include/motcpp/trackers/
hybridsort.hpp:127-164). The reference C++ is a *simplified* HybridSORT
(SURVEY.md §2.5 note): the 4-corner velocity machinery is declared but
ignored by the association, and giou/ciou/diou degrade to plain IoU in
its private dispatch — we replicate those simplifications for parity.

Replicated behaviors:
  * 9D Kalman filter with the confidence score IN the state
    ([u, v, s, c, r, du, dv, ds, dc], hybridsort.cpp:26-58); plain
    (non-Joseph) covariance update
  * track scores: kalman_score = clip(x[3], track_thresh, 1);
    simple_score = clip(conf - (conf_pre - conf), 0.1, track_thresh)
    (first update: clip(conf, 0.1, track_thresh))
    (hybridsort.cpp:371-381)
  * stage 1 on high dets (conf > det_thresh): cost (1 - asso) [+ EG_high
    * emb_dist when with_reid], threshold (1-iou_thr) [*1 + EG_high],
    IoU post-filter with the long-term correction rescue
    ``iou >= thr/2 and emb_dist <= 0.3`` (hybridsort.cpp:735-800);
    NOTE the reference's reid branch builds its embedding matrix
    transposed (n_trks, n_dets) which cannot be added to the
    (n_dets, n_trks) cost — we use the correct orientation
  * BYTE stage: iou(second dets, leftover trks) minus
    TCM |simple_score - det_conf| * weight, gated on max > iou_thr,
    embedding term with EG_low; feature update suppressed
    (hybridsort.cpp:1054-1125)
  * final rematch of leftover high dets vs last observation boxes,
    feature update suppressed (hybridsort.cpp:1128-1199)
  * unmatched tracks receive the C++ null-update quirk: a full KF
    update toward a ZERO measurement (hybridsort.cpp:322-328 calls
    kf.update(VectorXf::Zero(5)))
  * empty raw input: predict + prune only — no null updates
    (hybridsort.cpp:809-830)
  * smooth feature EMA alpha (adapfs variant supported); the long-term
    feature bank deque is write-only in the reference (its cost is never
    consumed by the simplified association), so it is not materialized
  * output gate tsu < 1 and (hit_streak >= min_hits or frame <=
    min_hits); box = last observation else KF box; ids emitted +1
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.models.ocsort import _NO_AGE
from motcpp_tpu.ops.iou import hmiou_batch, iou_batch
from motcpp_tpu.ops.lap import solve_lap_masked


@dataclasses.dataclass(frozen=True)
class HybridSortConfig:
    """Reference defaults: hybridsort.hpp:127-164."""

    det_thresh: float = 0.7
    max_age: int = 30
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.15
    asso_func: str = "hmiou"
    low_thresh: float = 0.1
    delta_t: int = 3
    inertia: float = 0.05
    use_byte: bool = True
    longterm_bank_length: int = 30
    alpha: float = 0.9
    adapfs: bool = False
    track_thresh: float = 0.5
    eg_weight_high_score: float = 4.6
    eg_weight_low_score: float = 1.3
    tcm_first_step: bool = True
    tcm_byte_step: bool = True
    tcm_byte_step_weight: float = 1.0
    high_score_matching_thresh: float = 0.7
    with_longterm_reid: bool = True
    longterm_reid_weight: float = 0.0
    with_longterm_reid_correction: bool = True
    longterm_reid_correction_thresh: float = 0.4
    longterm_reid_correction_thresh_low: float = 0.4
    with_reid: bool = True
    emb_dim: int = 1
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"

    @property
    def ring(self) -> int:
        return self.delta_t + 2


class HybridState(NamedTuple):
    x: jnp.ndarray  # (K, 9)
    P: jnp.ndarray  # (K, 9, 9)
    active: jnp.ndarray
    tid: jnp.ndarray
    age: jnp.ndarray
    hits: jnp.ndarray
    hit_streak: jnp.ndarray
    tsu: jnp.ndarray
    conf: jnp.ndarray
    conf_pre: jnp.ndarray
    cls: jnp.ndarray
    det_ind: jnp.ndarray
    last_obs: jnp.ndarray  # (K, 5)
    obs_ring: jnp.ndarray
    obs_age: jnp.ndarray
    obs_ptr: jnp.ndarray
    feat: jnp.ndarray  # (K, D) smooth feature
    has_feat: jnp.ndarray
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


# KF constants (hybridsort.cpp:26-58)
_F9 = (
    jnp.eye(9)
    .at[0, 5].set(1.0)
    .at[1, 6].set(1.0)
    .at[2, 7].set(1.0)
    .at[3, 8].set(1.0)
)
_Q9 = jnp.diag(
    jnp.asarray([0.1, 0.1, 0.1, 0.1, 0.1, 0.01, 0.01, 0.01, 0.01], jnp.float32)
)
_R5 = jnp.diag(jnp.asarray([1.0, 1.0, 10.0, 0.01, 1.0], jnp.float32))
_P09 = jnp.diag(
    jnp.asarray([10.0] * 5 + [10000.0] * 4, jnp.float32)
)


def _bbox_to_z5(xyxy, conf):
    w = xyxy[..., 2] - xyxy[..., 0]
    h = xyxy[..., 3] - xyxy[..., 1]
    u = xyxy[..., 0] + w * 0.5
    v = xyxy[..., 1] + h * 0.5
    s = w * h
    r = jnp.where(h > 1e-6, w / jnp.where(h > 1e-6, h, 1.0), 0.0)
    return jnp.stack([u, v, s, conf, r], axis=-1)


def _x_to_bbox(x):
    u, v, s, r = x[..., 0], x[..., 1], x[..., 2], x[..., 4]
    w = jnp.sqrt(s * r)
    h = s / jnp.where(w != 0.0, w, 1e-12)
    return jnp.stack([u - w / 2, v - h / 2, u + w / 2, v + h / 2], axis=-1)


def _kf_predict(x, P):
    """F = I + U with U the velocity shift ((0..3) += (5..8)), so
    F P Fᵀ = P + U P + P Uᵀ + U P Uᵀ is four slice adds — no 9x9
    matmuls (profiled: batched tiny dot_general dominated the frame)."""
    new_x = (
        x.at[..., 0].add(x[..., 5])
        .at[..., 1].add(x[..., 6])
        .at[..., 2].add(x[..., 7])
        .at[..., 3].add(x[..., 8])
    )
    new_P = (
        P.at[..., :4, :].add(P[..., 5:9, :])   # U P
        .at[..., :, :4].add(P[..., :, 5:9])    # P Uᵀ (of the original P)
        .at[..., :4, :4].add(P[..., 5:9, 5:9])  # U P Uᵀ
    ) + _Q9
    return new_x, new_P


def _kf_update(x, P, z):
    """Plain (I - KH) P update (hybridsort.cpp:73-90).

    H = [I5 | 0], so (I - KH) P = P - K P[:5, :] — a rank-5 correction
    unrolled into broadcast FMAs (ops/linalg.matmul_small) instead of
    batched 9x9 matmuls."""
    from motcpp_tpu.ops.linalg import matmul_small, solve_spd

    S = P[:, :5, :5] + _R5
    PHt = P[:, :, :5]
    Kg = jnp.swapaxes(solve_spd(S, jnp.swapaxes(PHt, -1, -2)), -1, -2)
    innov = z - x[:, :5]
    new_x = x + jnp.sum(Kg * innov[:, None, :], axis=-1)
    new_P = P - matmul_small(Kg, P[:, :5, :])
    return new_x, new_P


def make_hybridsort(cfg: HybridSortConfig):
    K = cfg.max_tracks
    R = cfg.ring
    D = cfg.emb_dim

    if cfg.asso_func == "hmiou":
        asso = hmiou_batch
    else:
        # giou/ciou/diou degrade to plain IoU in the reference's private
        # dispatch (hybridsort.cpp:579-592)
        asso = iou_batch

    def init_fn() -> HybridState:
        return HybridState(
            x=jnp.zeros((K, 9), jnp.float32),
            P=jnp.broadcast_to(_P09, (K, 9, 9)).astype(jnp.float32),
            active=jnp.zeros((K,), bool),
            tid=jnp.zeros((K,), jnp.int32),
            age=jnp.zeros((K,), jnp.int32),
            hits=jnp.zeros((K,), jnp.int32),
            hit_streak=jnp.zeros((K,), jnp.int32),
            tsu=jnp.zeros((K,), jnp.int32),
            conf=jnp.zeros((K,), jnp.float32),
            conf_pre=jnp.zeros((K,), jnp.float32),
            cls=jnp.zeros((K,), jnp.float32),
            det_ind=jnp.full((K,), -1, jnp.int32),
            last_obs=jnp.full((K, 5), -1.0, jnp.float32),
            obs_ring=jnp.full((K, R, 5), -1.0, jnp.float32),
            obs_age=jnp.full((K, R), _NO_AGE, jnp.int32),
            obs_ptr=jnp.zeros((K,), jnp.int32),
            feat=jnp.zeros((K, D), jnp.float32),
            has_feat=jnp.zeros((K,), bool),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def _apply_update(vars_, t2d, dets, det_conf, dets_feat, det_has_feat,
                      frame_age, feat_mask):
        """feat_mask: (K,) bool — rows whose feature bank may update
        (only first-stage matches smooth features, hybridsort.cpp:1010);
        lets one merged call carry per-stage feature semantics."""
        (x, P, conf, conf_pre, cls, det_ind, last_obs, obs_ring, obs_age,
         obs_ptr, tsu, hits, hit_streak, feat, has_feat) = vars_
        N = dets.shape[0]
        m = t2d >= 0
        j = jnp.clip(t2d, 0, N - 1)
        dbox = dets[j][:, :4]
        dconf = det_conf[j]

        new_obs = jnp.concatenate([dbox, dconf[:, None]], axis=-1)
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
        cls = jnp.where(m, dets[j][:, 5], cls)
        det_ind = jnp.where(m, j, det_ind)

        z = _bbox_to_z5(dbox, dconf)
        ux, uP = _kf_update(x, P, z)
        x = jnp.where(m[:, None], ux, x)
        P = jnp.where(m[:, None, None], uP, P)

        if cfg.with_reid:
            dfeat = dets_feat[j]
            dgood = det_has_feat[j]
            if cfg.adapfs:
                pre_w = cfg.alpha * (conf / (conf + dconf + 1e-12))
                cur_w = (1.0 - cfg.alpha) * (dconf / (conf + dconf + 1e-12))
                tot = pre_w + cur_w
                pre_w = pre_w / jnp.where(tot > 0, tot, 1.0)
                cur_w = cur_w / jnp.where(tot > 0, tot, 1.0)
                smoothed = pre_w[:, None] * feat + cur_w[:, None] * dfeat
            else:
                smoothed = cfg.alpha * feat + (1.0 - cfg.alpha) * dfeat
            nrm = jnp.linalg.norm(smoothed, axis=-1, keepdims=True) + 1e-12
            smoothed = smoothed / nrm
            new_feat = jnp.where(has_feat[:, None], smoothed, dfeat)
            upd = feat_mask & m & dgood
            feat = jnp.where(upd[:, None], new_feat, feat)
            has_feat = has_feat | upd

        conf_pre = jnp.where(m, conf, conf_pre)
        conf = jnp.where(m, dconf, conf)
        return (x, P, conf, conf_pre, cls, det_ind, last_obs, obs_ring,
                obs_age, obs_ptr, tsu, hits, hit_streak, feat, has_feat)

    def step_fn(state: HybridState, dets, det_mask, embs=None, warp=None):
        N = dets.shape[0]
        frame = state.frame_count + 1
        det_conf = dets[:, 4]
        det_xyxy = dets[:, :4]
        empty_input = ~jnp.any(det_mask)

        keep = det_mask & (det_conf > cfg.det_thresh)
        second = det_mask & (det_conf > cfg.low_thresh) & (
            det_conf < cfg.det_thresh
        )

        if cfg.with_reid and embs is not None:
            dets_feat = embs[:, :D]
            n = jnp.linalg.norm(dets_feat, axis=-1, keepdims=True)
            det_has_feat = det_mask & (n[:, 0] > 0)
            dets_feat = dets_feat / jnp.where(n > 0, n, 1.0)
        else:
            dets_feat = jnp.ones((N, D), jnp.float32)
            det_has_feat = jnp.zeros((N,), bool)

        x = state.x
        P0_state = state.P
        # --- CMC camera_update before predict (hybridsort.cpp:91-121):
        #     rebuild [u,v,s,c,r] from warped corners and ZERO velocities
        #     (kf.init is called with the new measurement) ----------------
        if warp is not None:
            bb = _x_to_bbox(x)
            ones = jnp.ones_like(bb[:, :1])
            p1 = jnp.concatenate([bb[:, 0:2], ones], 1) @ warp.T
            p2 = jnp.concatenate([bb[:, 2:4], ones], 1) @ warp.T
            wn = p2[:, 0] - p1[:, 0]
            hn = p2[:, 1] - p1[:, 1]
            un = p1[:, 0] + wn / 2.0
            vn = p1[:, 1] + hn / 2.0
            sn = wn * hn
            rn = jnp.where(hn > 1e-6, wn / jnp.where(hn > 1e-6, hn, 1.0), 0.0)
            warped = jnp.stack(
                [un, vn, sn, x[:, 3], rn], axis=-1
            )
            new_x9 = jnp.concatenate(
                [warped, jnp.zeros((K, 4), jnp.float32)], axis=-1
            )
            apply_w = state.active & jnp.any(det_mask)
            x = jnp.where(apply_w[:, None], new_x9, x)

        # --- predict with scale clamp (hybridsort.cpp:258-272) -----------
        clamp = (x[:, 7] + x[:, 2]) <= 0
        x = x.at[:, 7].set(jnp.where(clamp, 0.0, x[:, 7]))
        px, pP = _kf_predict(x, P0_state)
        x = jnp.where(state.active[:, None], px, state.x)
        P = jnp.where(state.active[:, None, None], pP, state.P)
        age = jnp.where(state.active, state.age + 1, state.age)
        hit_streak = jnp.where(
            state.active & (state.tsu > 0), 0, state.hit_streak
        )
        tsu = jnp.where(state.active, state.tsu + 1, state.tsu)
        active = state.active

        # track rows (hybridsort.cpp:936-952)
        kf_box = _x_to_bbox(x)
        obs_valid = jnp.sum(state.last_obs[:, :4], axis=1) >= 0
        trk_box = jnp.where(obs_valid[:, None], state.last_obs[:, :4], kf_box)
        kalman_score = jnp.clip(x[:, 3], cfg.track_thresh, 1.0)
        simple_score = jnp.where(
            state.conf_pre == 0.0,
            jnp.clip(state.conf, 0.1, cfg.track_thresh),
            jnp.clip(
                state.conf - (state.conf_pre - state.conf),
                0.1,
                cfg.track_thresh,
            ),
        )

        # ================= stage 1 =======================================
        iou1 = asso(det_xyxy, trk_box)  # (N, K)
        gate1 = cfg.tcm_first_step & jnp.any(keep) & jnp.any(active)
        use_reid1 = cfg.with_reid and cfg.eg_weight_high_score > 0
        if use_reid1:
            emb_dist = 1.0 - dets_feat @ state.feat.T  # (N, K)
            emb_dist = jnp.where(
                det_has_feat[:, None] & state.has_feat[None, :], emb_dist, 1.0
            )
            cost1 = (1.0 - iou1) * 1.0 + emb_dist * cfg.eg_weight_high_score
            thresh1 = (1.0 - cfg.iou_threshold) * 1.0 + cfg.eg_weight_high_score
        else:
            emb_dist = jnp.ones_like(iou1)
            cost1 = 1.0 - iou1
            thresh1 = 1.0 - cfg.iou_threshold
        d2t1, c2r1_unused = solve_lap_masked(
            cost1, keep & gate1, active & gate1, thresh1, impl=cfg.lap_impl
        )
        sel_iou = jnp.take_along_axis(
            iou1, jnp.clip(d2t1, 0, K - 1)[:, None], axis=1
        )[:, 0]
        sel_emb = jnp.take_along_axis(
            emb_dist, jnp.clip(d2t1, 0, K - 1)[:, None], axis=1
        )[:, 0]
        ok = sel_iou >= cfg.iou_threshold
        if use_reid1 and cfg.with_longterm_reid_correction:
            ok = ok | (
                (sel_iou >= cfg.iou_threshold / 2.0) & (sel_emb <= 0.3)
            )
        d2t1 = jnp.where((d2t1 >= 0) & ok, d2t1, -1)
        t2d1 = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(d2t1 >= 0, d2t1, K)
        ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")

        # commits deferred: the BYTE and rematch stages below only read
        # state on rows stage 1 leaves unmatched, so all stages' updates
        # apply once as a merged batched commit (bit-exact vs sequential
        # — each row is matched by at most one stage; same pattern as
        # bytetrack.py/ocsort.py). Only stage-1 matches update features.
        vars_ = (x, P, state.conf, state.conf_pre, state.cls, state.det_ind,
                 state.last_obs, state.obs_ring, state.obs_age, state.obs_ptr,
                 tsu, state.hits, hit_streak, state.feat, state.has_feat)
        t2d_all = t2d1
        u_trk = active & (t2d1 < 0)
        u_det = keep & (d2t1 < 0)

        # ================= BYTE stage ====================================
        if cfg.use_byte:
            iou_b = iou_batch(det_xyxy, trk_box)  # second dets x trks
            if cfg.tcm_byte_step:
                score_diff = jnp.abs(
                    simple_score[None, :] - det_conf[:, None]
                )
                iou_b = iou_b - score_diff * cfg.tcm_byte_step_weight
            masked_b = jnp.where(
                second[:, None] & u_trk[None, :], iou_b, -jnp.inf
            )
            gate_b = (
                jnp.any(second)
                & jnp.any(u_trk)
                & (jnp.max(masked_b, initial=-jnp.inf) > cfg.iou_threshold)
            )
            cost_b = 1.0 - iou_b
            if cfg.with_reid and cfg.eg_weight_low_score > 0:
                # pre-update features: identical on every u_trk column
                # (stage 1 never wrote unmatched rows); matched columns
                # are masked out of the gate and the solve
                emb_low = 1.0 - dets_feat @ state.feat.T
                emb_low = jnp.where(
                    det_has_feat[:, None] & state.has_feat[None, :],
                    emb_low, 1.0,
                )
                cost_b = cost_b + emb_low * cfg.eg_weight_low_score
            d2t_b, _ = solve_lap_masked(
                cost_b, second & gate_b, u_trk & gate_b,
                1.0 - cfg.iou_threshold, impl=cfg.lap_impl,
            )
            selb = jnp.take_along_axis(
                iou_b, jnp.clip(d2t_b, 0, K - 1)[:, None], axis=1
            )[:, 0]
            d2t_b = jnp.where(
                (d2t_b >= 0) & (selb >= cfg.iou_threshold), d2t_b, -1
            )
            t2d_b = jnp.full((K,), -1, jnp.int32).at[
                jnp.where(d2t_b >= 0, d2t_b, K)
            ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
            t2d_all = jnp.where(t2d_all >= 0, t2d_all, t2d_b)
            u_trk = u_trk & (t2d_b < 0)

        # ================= final rematch on last boxes ===================
        # pre-update last_obs (identical on u_trk rows; see above)
        iou_r = iou_batch(det_xyxy, state.last_obs[:, :4])
        masked_r = jnp.where(u_det[:, None] & u_trk[None, :], iou_r, -jnp.inf)
        gate_r = (
            jnp.any(u_det)
            & jnp.any(u_trk)
            & (jnp.max(masked_r, initial=-jnp.inf) > cfg.iou_threshold)
        )
        d2t_r, _ = solve_lap_masked(
            1.0 - iou_r, u_det & gate_r, u_trk & gate_r,
            1.0 - cfg.iou_threshold, impl=cfg.lap_impl,
        )
        selr = jnp.take_along_axis(
            iou_r, jnp.clip(d2t_r, 0, K - 1)[:, None], axis=1
        )[:, 0]
        d2t_r = jnp.where((d2t_r >= 0) & (selr >= cfg.iou_threshold), d2t_r, -1)
        t2d_r = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(d2t_r >= 0, d2t_r, K)
        ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        t2d_all = jnp.where(t2d_all >= 0, t2d_all, t2d_r)
        vars_ = _apply_update(
            vars_, t2d_all, dets, det_conf, dets_feat, det_has_feat, age,
            t2d1 >= 0,
        )
        u_trk = u_trk & (t2d_r < 0)
        u_det = u_det & (d2t_r < 0)

        (x, P, conf, conf_pre, cls, det_ind, last_obs, obs_ring, obs_age,
         obs_ptr, tsu, hits, hit_streak, feat, has_feat) = vars_

        # --- null update: KF toward a ZERO measurement (the C++ quirk,
        #     hybridsort.cpp:322-328); skipped on empty raw input ---------
        null_m = u_trk & ~empty_input
        zx, zP = _kf_update(x, P, jnp.zeros((K, 5), jnp.float32))
        x = jnp.where(null_m[:, None], zx, x)
        P = jnp.where(null_m[:, None, None], zP, P)
        conf_pre = jnp.where(null_m, 0.0, conf_pre)

        # --- births ------------------------------------------------------
        birth_cand = u_det & ~empty_input
        free = ~active
        det_rank = jnp.cumsum(birth_cand.astype(jnp.int32)) - 1
        slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        n_new = jnp.sum(birth_cand.astype(jnp.int32))
        pos_by_rank = (
            jnp.full((K,), N, jnp.int32)
            .at[jnp.where(birth_cand, det_rank, K)]
            .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        )
        births = free & (slot_rank < n_new)
        bdet = jnp.where(births, pos_by_rank[jnp.clip(slot_rank, 0, K - 1)], 0)
        bz = _bbox_to_z5(det_xyxy[bdet], det_conf[bdet])
        bx = jnp.concatenate([bz, jnp.zeros((K, 4), jnp.float32)], axis=-1)
        x = jnp.where(births[:, None], bx, x)
        P = jnp.where(births[:, None, None], _P09, P)
        conf = jnp.where(births, det_conf[bdet], conf)
        conf_pre = jnp.where(births, 0.0, conf_pre)
        cls = jnp.where(births, dets[bdet][:, 5], cls)
        det_ind = jnp.where(births, bdet, det_ind)
        age = jnp.where(births, 0, age)
        hits = jnp.where(births, 0, hits)
        hit_streak = jnp.where(births, 0, hit_streak)
        tsu = jnp.where(births, 0, tsu)
        last_obs = jnp.where(births[:, None], -1.0, last_obs)
        obs_ring = jnp.where(births[:, None, None], -1.0, obs_ring)
        obs_age = jnp.where(births[:, None], _NO_AGE, obs_age)
        obs_ptr = jnp.where(births, 0, obs_ptr)
        feat = jnp.where(births[:, None], dets_feat[bdet], feat)
        has_feat = jnp.where(births, det_has_feat[bdet], has_feat)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            n_new, jnp.sum(free.astype(jnp.int32))
        )
        active = active | births

        # --- output (id + 1, hybridsort.cpp:1226-1238) -------------------
        obs_ok = jnp.sum(last_obs[:, :4], axis=1) >= 0
        out_box = jnp.where(obs_ok[:, None], last_obs[:, :4], _x_to_bbox(x))
        out_mask = (
            active
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

        active = active & (tsu <= cfg.max_age)

        new_state = HybridState(
            x=x, P=P, active=active, tid=tid, age=age, hits=hits,
            hit_streak=hit_streak, tsu=tsu, conf=conf, conf_pre=conf_pre,
            cls=cls, det_ind=det_ind, last_obs=last_obs, obs_ring=obs_ring,
            obs_age=obs_age, obs_ptr=obs_ptr, feat=feat, has_feat=has_feat,
            next_id=next_id, frame_count=frame,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("hybridsort")
class HybridSort(BaseTrackerWrapper):
    """Host-facing HybridSORT (reference: hybridsort.hpp:127-164)."""

    def __init__(
        self,
        reid_weights: str = "",
        use_half: bool = False,
        use_gpu: bool = False,
        det_thresh: float = 0.7,
        max_age: int = 30,
        max_obs: int = 50,
        min_hits: int = 3,
        iou_threshold: float = 0.15,
        per_class: bool = False,
        nr_classes: int = 80,
        asso_func: str = "hmiou",
        is_obb: bool = False,
        low_thresh: float = 0.1,
        delta_t: int = 3,
        inertia: float = 0.05,
        use_byte: bool = True,
        use_custom_kf: bool = True,
        longterm_bank_length: int = 30,
        alpha: float = 0.9,
        adapfs: bool = False,
        track_thresh: float = 0.5,
        EG_weight_high_score: float = 4.6,
        EG_weight_low_score: float = 1.3,
        TCM_first_step: bool = True,
        TCM_byte_step: bool = True,
        TCM_byte_step_weight: float = 1.0,
        high_score_matching_thresh: float = 0.7,
        with_longterm_reid: bool = True,
        longterm_reid_weight: float = 0.0,
        with_longterm_reid_correction: bool = True,
        longterm_reid_correction_thresh: float = 0.4,
        longterm_reid_correction_thresh_low: float = 0.4,
        cmc_method: str = "ecc",
        with_reid: bool = True,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
        emb_dim: int = 1,
    ):
        super().__init__(max_dets=max_dets, emb_dim=emb_dim)
        del per_class, nr_classes, is_obb, use_half, use_gpu, use_custom_kf
        del cmc_method
        self.reid_weights = reid_weights
        self._cfg_kw = dict(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            asso_func=asso_func,
            low_thresh=low_thresh,
            delta_t=delta_t,
            inertia=inertia,
            use_byte=use_byte,
            longterm_bank_length=longterm_bank_length,
            alpha=alpha,
            adapfs=adapfs,
            track_thresh=track_thresh,
            eg_weight_high_score=EG_weight_high_score,
            eg_weight_low_score=EG_weight_low_score,
            tcm_first_step=TCM_first_step,
            tcm_byte_step=TCM_byte_step,
            tcm_byte_step_weight=TCM_byte_step_weight,
            high_score_matching_thresh=high_score_matching_thresh,
            with_longterm_reid=with_longterm_reid,
            longterm_reid_weight=longterm_reid_weight,
            with_longterm_reid_correction=with_longterm_reid_correction,
            longterm_reid_correction_thresh=longterm_reid_correction_thresh,
            longterm_reid_correction_thresh_low=longterm_reid_correction_thresh_low,
            with_reid=with_reid,
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self._build(emb_dim)

    def _build(self, emb_dim: int):
        self.cfg = HybridSortConfig(**self._cfg_kw, emb_dim=emb_dim)
        self._init, self._core_step = make_hybridsort(self.cfg)
        self._jit_step = None

    def update(self, dets, img=None, embs=None, warp=None):
        import numpy as np

        dets = np.asarray(dets, np.float32)
        # empty raw input path: predict + prune, nothing emitted
        # (hybridsort.cpp:809-830) — handled in-core via the det mask
        embs_arr = None if embs is None else np.asarray(embs, np.float32)
        if (
            embs_arr is not None
            and embs_arr.size > 0
            and embs_arr.shape[1] != self.cfg.emb_dim
        ):
            self.emb_dim = embs_arr.shape[1]
            self._build(embs_arr.shape[1])
            self._state = None
        return super().update(dets, img, embs_arr, warp=warp)

    def _compute_warp(self, img, dets):
        # ECC (hybridsort.cpp:846-857)
        if img is None or dets.shape[0] == 0:
            return None
        if getattr(self, "_cmc", None) is None:
            from motcpp_tpu.motion.cmc import ECC

            self._cmc = ECC()
        return self._cmc.apply(img, dets)

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask, embs, warp=warp)

    def _init_state(self):
        return self._init()
