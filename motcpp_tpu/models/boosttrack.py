"""BoostTrack — confidence boosting + fused Mahalanobis/embedding cost.

Functional re-design of the reference tracker (reference:
src/trackers/boosttrack.cpp:14-699, include/motcpp/trackers/
boosttrack.hpp:96-127). Single-stage association on a fixed slot array:

  * private [x, y, h, r] Kalman filter (8D state, fixed Q/R:
    boosttrack.cpp:22-54); simple (non-Joseph) covariance update
  * confidence boosting BEFORE thresholding (boosttrack.cpp:361-426):
    - plain DLO (only when neither sb nor vt):
      ``conf = max(conf, maxIoU * dlo_boost_coef)``
    - soft-boost (use_sb): ``max(conf, 0.65*conf + 0.35*maxIoU^1.5)``
    - visual-track boost (use_vt): any track with
      ``IoU > max(0.95 - tsu, 0.8)`` lifts conf to det_thresh + 1e-5
    - DUO boost is a stub returning input unchanged
      (boosttrack.cpp:428-432)
  * fused cost (dets x trks): (1 - IoU) - lambda_mhd * MhSim
    - lambda_emb * EmbSim, where MhSim = (13.2767 - clip(maha)) /
    13.2767 with a DIAGONAL-covariance Mahalanobis over [x, y, h, r]
    (boosttrack.cpp:331-359, 593-615), EmbSim = (cos + 1) / 2, and
    lambda_emb = (1 + l_iou + l_shape + l_mhd) * 1.5; JV at
    iou_threshold
  * per-det EMA embedding alpha like DeepOC-SORT with fixed 0.95 base
    (boosttrack.cpp:638-641)
  * ECC camera_update before predict; output gate
    ``tsu < 1 and (hit_streak >= min_hits or frame <= min_hits)`` with
    first-frame tracks emitted (no empty-pool early return); output
    rows filtered by aspect ratio <= thresh and area > min_box_area
    (boosttrack.cpp:434-463, 663-698)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.ops.iou import iou_batch
from motcpp_tpu.ops.lap import solve_lap_masked

MH_LIMIT = 13.2767  # 99% chi2, 4 dof (boosttrack.cpp:600)


@dataclasses.dataclass(frozen=True)
class BoostTrackConfig:
    """Reference defaults: boosttrack.hpp:96-125; eval tool uses the
    BoostTrack++ flags (rich_s/sb/vt on, motcpp_eval.cpp:247-277)."""

    det_thresh: float = 0.6
    max_age: int = 60
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    use_ecc: bool = True
    min_box_area: int = 10
    aspect_ratio_thresh: float = 1.6
    lambda_iou: float = 0.5
    lambda_mhd: float = 0.25
    lambda_shape: float = 0.25
    use_dlo_boost: bool = True
    use_duo_boost: bool = True
    dlo_boost_coef: float = 0.65
    s_sim_corr: bool = False
    use_rich_s: bool = False
    use_sb: bool = False
    use_vt: bool = False
    with_reid: bool = False
    emb_dim: int = 1
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"


class BoostState(NamedTuple):
    x: jnp.ndarray  # (K, 8) [x, y, h, r, vx, vy, vh, vr]
    P: jnp.ndarray  # (K, 8, 8)
    active: jnp.ndarray
    tid: jnp.ndarray
    conf: jnp.ndarray
    cls: jnp.ndarray
    det_ind: jnp.ndarray
    age: jnp.ndarray
    tsu: jnp.ndarray
    hit_streak: jnp.ndarray
    emb: jnp.ndarray  # (K, D)
    has_emb: jnp.ndarray
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


# constant KF matrices (boosttrack.cpp:27-53)
_Q = jnp.diag(jnp.asarray([10.0] * 4 + [0.01] * 4, jnp.float32))
_R = jnp.diag(jnp.asarray([1.0, 1.0, 10.0, 0.01], jnp.float32))
_P0 = jnp.diag(jnp.asarray([10.0] * 4 + [10000.0] * 4, jnp.float32))


def _bbox_to_z(xyxy):
    """xyxy -> [cx, cy, h, r=w/h] (boosttrack.cpp:127-134)."""
    w = xyxy[..., 2] - xyxy[..., 0]
    h = xyxy[..., 3] - xyxy[..., 1]
    cx = xyxy[..., 0] + w * 0.5
    cy = xyxy[..., 1] + h * 0.5
    r = jnp.where(h > 1e-6, w / jnp.where(h > 1e-6, h, 1.0), 0.0)
    return jnp.stack([cx, cy, h, r], axis=-1)


def _z_to_bbox(x):
    """state[:4] -> xyxy (boosttrack.cpp:107-115)."""
    cx, cy, h, r = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    w = r * h
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def _kf_predict(x, P):
    pos = x[..., :4] + x[..., 4:]
    new_x = jnp.concatenate([pos, x[..., 4:]], axis=-1)
    A = P[..., :4, :4]
    B = P[..., :4, 4:]
    C = P[..., 4:, :4]
    Dm = P[..., 4:, 4:]
    top = jnp.concatenate([A + B + C + Dm, B + Dm], axis=-1)
    bot = jnp.concatenate([C + Dm, Dm], axis=-1)
    new_P = jnp.concatenate([top, bot], axis=-2) + _Q
    return new_x, new_P


def _kf_update(x, P, z):
    """Simple P - K S Kᵀ update (boosttrack.cpp:84-100); the tiny
    contractions are unrolled FMAs (ops/linalg.matmul_small) — batched
    8x8 dot_general is the profiled bottleneck shape on TPU."""
    from motcpp_tpu.ops.linalg import matmul_small, solve_spd

    S = P[..., :4, :4] + _R
    PHt = P[..., :, :4]
    Kg = jnp.swapaxes(solve_spd(S, jnp.swapaxes(PHt, -1, -2)), -1, -2)
    innov = z - x[..., :4]
    new_x = x + jnp.sum(Kg * innov[..., None, :], axis=-1)
    KS = matmul_small(Kg, S)
    new_P = P - matmul_small(KS, jnp.swapaxes(Kg, -1, -2))
    return new_x, new_P


def make_boosttrack(cfg: BoostTrackConfig):
    K = cfg.max_tracks
    D = cfg.emb_dim

    def init_fn() -> BoostState:
        return BoostState(
            x=jnp.zeros((K, 8), jnp.float32),
            P=jnp.broadcast_to(_P0, (K, 8, 8)).astype(jnp.float32),
            active=jnp.zeros((K,), bool),
            tid=jnp.zeros((K,), jnp.int32),
            conf=jnp.zeros((K,), jnp.float32),
            cls=jnp.zeros((K,), jnp.float32),
            det_ind=jnp.full((K,), -1, jnp.int32),
            age=jnp.zeros((K,), jnp.int32),
            tsu=jnp.zeros((K,), jnp.int32),
            hit_streak=jnp.zeros((K,), jnp.int32),
            emb=jnp.ones((K, D), jnp.float32),
            has_emb=jnp.zeros((K,), bool),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def step_fn(state: BoostState, dets, det_mask, embs=None, warp=None):
        N = dets.shape[0]
        frame = state.frame_count + 1
        det_xyxy = dets[:, :4]

        x, P = state.x, state.P

        # --- CMC before predict (boosttrack.cpp:486-495) -----------------
        if warp is not None:
            do = jnp.any(det_mask)
            bb = _z_to_bbox(x)
            ones = jnp.ones_like(bb[:, :1])
            p1 = jnp.concatenate([bb[:, 0:2], ones], 1) @ warp.T
            p2 = jnp.concatenate([bb[:, 2:4], ones], 1) @ warp.T
            new_z = _bbox_to_z(jnp.concatenate([p1, p2], axis=1))
            apply = state.active & do
            x = jnp.where(apply[:, None], x.at[:, :4].set(new_z), x)

        # --- predict (boosttrack.cpp:156-163, 497-514) -------------------
        px, pP = _kf_predict(x, P)
        x = jnp.where(state.active[:, None], px, x)
        P = jnp.where(state.active[:, None, None], pP, P)
        age = jnp.where(state.active, state.age + 1, state.age)
        hit_streak = jnp.where(
            state.active & (state.tsu > 0), 0, state.hit_streak
        )
        tsu = jnp.where(state.active, state.tsu + 1, state.tsu)
        active = state.active

        trk_xyxy = _z_to_bbox(x)

        # --- confidence boosting (boosttrack.cpp:361-426) ----------------
        det_conf = dets[:, 4]
        S = iou_batch(det_xyxy, trk_xyxy)  # (N, K)
        S = jnp.where(det_mask[:, None] & active[None, :], S, 0.0)
        any_trk = jnp.any(active)
        if cfg.use_dlo_boost:
            max_s = jnp.max(S, axis=1)
            if not cfg.use_sb and not cfg.use_vt:
                det_conf = jnp.where(
                    any_trk,
                    jnp.maximum(det_conf, max_s * cfg.dlo_boost_coef),
                    det_conf,
                )
            else:
                if cfg.use_sb:
                    alpha = 0.65
                    boosted = alpha * det_conf + (1 - alpha) * max_s**1.5
                    det_conf = jnp.where(
                        any_trk, jnp.maximum(det_conf, boosted), det_conf
                    )
                if cfg.use_vt:
                    # threshold decays with each track's (tsu - 1)
                    thr = jnp.maximum(
                        0.95 - (tsu - 1).astype(jnp.float32), 0.8
                    )[None, :]
                    hit = jnp.any(
                        (S > thr) & active[None, :], axis=1
                    )
                    det_conf = jnp.where(
                        any_trk & hit,
                        jnp.maximum(det_conf, cfg.det_thresh + 1e-5),
                        det_conf,
                    )
        # DUO boost is a no-op stub in the reference

        valid = det_mask & (det_conf >= cfg.det_thresh)

        if embs is None:
            dets_emb = jnp.ones((N, D), jnp.float32)
            det_has_emb = jnp.zeros((N,), bool)
        else:
            dets_emb = embs[:, :D]
            n = jnp.linalg.norm(dets_emb, axis=-1, keepdims=True)
            det_has_emb = valid & (n[:, 0] > 0)
            dets_emb = dets_emb / jnp.where(n > 0, n, 1.0)

        # --- fused single-stage cost (boosttrack.cpp:571-624) ------------
        iou_d = 1.0 - iou_batch(det_xyxy, trk_xyxy)  # (N, K)
        z_det = _bbox_to_z(det_xyxy)  # (N, 4)
        diff = z_det[:, None, :] - x[None, :, :4]  # (N, K, 4)
        sigma_inv = 1.0 / P[..., jnp.arange(4), jnp.arange(4)]  # (K, 4)
        maha = jnp.sum(diff**2 * sigma_inv[None, :, :], axis=-1)
        mh_sim = (MH_LIMIT - jnp.minimum(maha, MH_LIMIT)) / MH_LIMIT
        cost = iou_d - cfg.lambda_mhd * mh_sim
        if cfg.with_reid:
            lambda_emb = (
                1.0 + cfg.lambda_iou + cfg.lambda_shape + cfg.lambda_mhd
            ) * 1.5
            emb_sim = (dets_emb @ state.emb.T + 1.0) / 2.0
            emb_sim = jnp.where(
                det_has_emb[:, None] & state.has_emb[None, :], emb_sim, 0.5
            )
            cost = cost - lambda_emb * emb_sim

        d2t, t2d = solve_lap_masked(
            cost, valid, active, cfg.iou_threshold, impl=cfg.lap_impl
        )
        m = t2d >= 0
        j = jnp.clip(t2d, 0, N - 1)

        # --- matched updates (boosttrack.cpp:637-650) --------------------
        drow_conf = det_conf[j]
        z = _bbox_to_z(det_xyxy[j])
        ux, uP = _kf_update(x, P, z)
        x = jnp.where(m[:, None], ux, x)
        P = jnp.where(m[:, None, None], uP, P)
        conf = jnp.where(m, drow_conf, state.conf)
        cls = jnp.where(m, dets[j][:, 5], state.cls)
        det_ind = jnp.where(m, j, state.det_ind)
        tsu = jnp.where(m, 0, tsu)
        hit_streak = jnp.where(m, hit_streak + 1, hit_streak)

        trust = (drow_conf - cfg.det_thresh) / (1.0 - cfg.det_thresh)
        af = 0.95
        alpha_d = af + (1.0 - af) * (1.0 - trust)
        new_emb = alpha_d[:, None] * state.emb + (1 - alpha_d)[:, None] * dets_emb[j]
        nrm = jnp.linalg.norm(new_emb, axis=-1, keepdims=True)
        new_emb = new_emb / jnp.where(nrm > 0, nrm, 1.0)
        upd_e = m & det_has_emb[j]
        emb = jnp.where(
            upd_e[:, None],
            jnp.where(state.has_emb[:, None], new_emb, dets_emb[j]),
            state.emb,
        )
        has_emb = state.has_emb | upd_e

        # --- births ------------------------------------------------------
        u_det = valid & (d2t < 0)
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
        bz = _bbox_to_z(det_xyxy[bdet])
        bx = jnp.concatenate([bz, jnp.zeros_like(bz)], axis=-1)
        x = jnp.where(births[:, None], bx, x)
        P = jnp.where(births[:, None, None], _P0, P)
        conf = jnp.where(births, det_conf[bdet], conf)
        cls = jnp.where(births, dets[bdet][:, 5], cls)
        det_ind = jnp.where(births, bdet, det_ind)
        age = jnp.where(births, 0, age)
        tsu = jnp.where(births, 0, tsu)
        hit_streak = jnp.where(births, 0, hit_streak)
        emb = jnp.where(births[:, None], dets_emb[bdet], emb)
        has_emb = jnp.where(births, det_has_emb[bdet], has_emb)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            n_new, jnp.sum(free.astype(jnp.int32))
        )
        active = active | births

        # --- output with box filtering (boosttrack.cpp:434-463, 663-698) -
        out_xyxy = _z_to_bbox(x)
        w = out_xyxy[:, 2] - out_xyxy[:, 0]
        h = out_xyxy[:, 3] - out_xyxy[:, 1]
        shape_ok = (w / (h + 1e-6) <= cfg.aspect_ratio_thresh) & (
            w * h > cfg.min_box_area
        )
        out_mask = (
            active
            & (tsu < 1)
            & ((hit_streak >= cfg.min_hits) | (frame <= cfg.min_hits))
            & shape_ok
        )
        out = jnp.concatenate(
            [
                out_xyxy,
                tid[:, None].astype(jnp.float32),
                conf[:, None],
                cls[:, None],
                det_ind[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )

        active = active & (tsu <= cfg.max_age)

        new_state = BoostState(
            x=x, P=P, active=active, tid=tid, conf=conf, cls=cls,
            det_ind=det_ind, age=age, tsu=tsu, hit_streak=hit_streak,
            emb=emb, has_emb=has_emb, next_id=next_id, frame_count=frame,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("boosttrack")
class BoostTrack(BaseTrackerWrapper):
    """Host-facing BoostTrack (reference: boosttrack.hpp:96-127; eval
    construction uses the BoostTrack++ flag set)."""

    def __init__(
        self,
        reid_weights: str = "",
        use_half: bool = False,
        use_gpu: bool = False,
        det_thresh: float = 0.6,
        max_age: int = 60,
        max_obs: int = 50,
        min_hits: int = 3,
        iou_threshold: float = 0.3,
        per_class: bool = False,
        nr_classes: int = 80,
        asso_func: str = "iou",
        is_obb: bool = False,
        use_ecc: bool = True,
        min_box_area: int = 10,
        aspect_ratio_thresh: float = 1.6,
        cmc_method: str = "ecc",
        lambda_iou: float = 0.5,
        lambda_mhd: float = 0.25,
        lambda_shape: float = 0.25,
        use_dlo_boost: bool = True,
        use_duo_boost: bool = True,
        dlo_boost_coef: float = 0.65,
        s_sim_corr: bool = False,
        use_rich_s: bool = False,
        use_sb: bool = False,
        use_vt: bool = False,
        with_reid: bool = False,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
        emb_dim: int = 1,
    ):
        super().__init__(max_dets=max_dets, emb_dim=emb_dim)
        del per_class, nr_classes, asso_func, is_obb, use_half, use_gpu
        del cmc_method
        self._cfg_kw = dict(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            use_ecc=use_ecc,
            min_box_area=min_box_area,
            aspect_ratio_thresh=aspect_ratio_thresh,
            lambda_iou=lambda_iou,
            lambda_mhd=lambda_mhd,
            lambda_shape=lambda_shape,
            use_dlo_boost=use_dlo_boost,
            use_duo_boost=use_duo_boost,
            dlo_boost_coef=dlo_boost_coef,
            s_sim_corr=s_sim_corr,
            use_rich_s=use_rich_s,
            use_sb=use_sb,
            use_vt=use_vt,
            with_reid=with_reid,
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self.reid_weights = reid_weights
        self._reid = None
        self._cmc = None
        self._build(emb_dim)

    def _build(self, emb_dim: int):
        self.cfg = BoostTrackConfig(**self._cfg_kw, emb_dim=emb_dim)
        self._init, self._core_step = make_boosttrack(self.cfg)
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
            self._build(embs_arr.shape[1])
            self._state = None
        return super().update(dets, img, embs_arr, warp=warp)

    def _compute_warp(self, img, dets):
        # ECC when enabled and detections exist (boosttrack.cpp:486-495)
        if not self.cfg.use_ecc or img is None or dets.shape[0] == 0:
            return None
        if self._cmc is None:
            from motcpp_tpu.motion.cmc import ECC

            self._cmc = ECC()
        return self._cmc.apply(img, dets)

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask, embs, warp=warp)

    def _init_state(self):
        return self._init()
