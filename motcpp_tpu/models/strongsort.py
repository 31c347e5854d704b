"""StrongSORT — DeepSORT architecture with NSA Kalman + EMA galleries.

Functional re-design of the reference tracker (reference:
src/trackers/strongsort.cpp:20-1023, include/motcpp/trackers/
strongsort.hpp:305-341). The per-track feature gallery
(NearestNeighborDistanceMetric with budget, strongsort.cpp:201-296)
becomes a (K, B, D) ring tensor so the min-cosine-distance gallery cost
is one MXU contraction; the cascade + IoU match become two masked JV
rounds.

Replicated reference behaviors:
  * detections filtered by ``conf >= min_conf`` only
    (strongsort.cpp:891-897); no high/low split
  * ECC camera_update on every frame BEFORE predict, rewriting the xyah
    position from warped corners, covariance untouched
    (strongsort.cpp:111-132, 915-921)
  * NSA Kalman: measurement noise scaled by (1 - conf) in update
    (strongsort.cpp:153, kalman_filter.cpp:66-68)
  * "matching cascade" flattened to a single min_cost_matching on all
    confirmed tracks (strongsort.cpp:418-449): cost = gallery min-cosine
    distance, rows with empty gallery at 1e5, Mahalanobis-gated at
    chi2inv95[4] to 1e5, then lambda-blended with the gating distance for
    ALL entries (strongsort.cpp:470-491); threshold max_cos_dist
  * IoU stage on unconfirmed + just-missed (tsu == 1) confirmed tracks,
    rows with tsu > 1 at 1e5, threshold max_iou_dist
    (strongsort.cpp:743-772, iou_matching 538-581)
  * lifecycle: Tentative until hits >= n_init; mark_missed deletes
    tentative immediately and confirmed past max_age
    (strongsort.cpp:184-195)
  * EMA feature: features holds only the smoothed vector; the gallery
    appends that smoothed feature EVERY frame for EVERY confirmed track
    (even unmatched ones re-append their stale feature), budget-capped
    to the most recent nn_budget entries (strongsort.cpp:157-178,
    639-661, 213-238)
  * output: confirmed tracks with tsu < 1, box from the KF mean
    (strongsort.cpp:982-1002); ids from 1
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.ops import boxes
from motcpp_tpu.ops.iou import iou_batch
from motcpp_tpu.ops.kalman.gaussian import kf_xyah
from motcpp_tpu.ops.lap import solve_lap_masked

FREE = 0
TENTATIVE = 1
CONFIRMED = 2

INFTY_COST = 1e5
GATING_THRESHOLD = 9.4877  # chi2inv95[4] (strongsort.cpp:461)


@dataclasses.dataclass(frozen=True)
class StrongSortConfig:
    """Reference defaults: strongsort.hpp:305-324."""

    det_thresh: float = 0.3
    max_age: int = 30
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    min_conf: float = 0.1
    max_cos_dist: float = 0.2
    max_iou_dist: float = 0.7
    n_init: int = 3
    nn_budget: int = 100
    mc_lambda: float = 0.98
    ema_alpha: float = 0.9
    emb_dim: int = 1
    gallery_cap: int = 100  # ring size (= min(nn_budget, cap))
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"

    @property
    def gallery(self) -> int:
        return min(self.nn_budget, self.gallery_cap)


class StrongSortState(NamedTuple):
    mean: jnp.ndarray  # (K, 8) XYAH
    cov: jnp.ndarray  # (K, 8, 8)
    sstate: jnp.ndarray  # (K,) {FREE, TENTATIVE, CONFIRMED}
    tid: jnp.ndarray
    conf: jnp.ndarray
    cls: jnp.ndarray
    det_ind: jnp.ndarray
    hits: jnp.ndarray
    age: jnp.ndarray
    tsu: jnp.ndarray
    feat: jnp.ndarray  # (K, D) current smoothed feature
    has_feat: jnp.ndarray  # (K,)
    gallery: jnp.ndarray  # (K, B, D)
    gallery_count: jnp.ndarray  # (K,) total appended (ring index base)
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


def make_strongsort(cfg: StrongSortConfig):
    K = cfg.max_tracks
    B = cfg.gallery
    D = cfg.emb_dim

    def init_fn() -> StrongSortState:
        return StrongSortState(
            mean=jnp.zeros((K, 8), jnp.float32),
            cov=jnp.broadcast_to(jnp.eye(8), (K, 8, 8)).astype(jnp.float32),
            sstate=jnp.zeros((K,), jnp.int32),
            tid=jnp.zeros((K,), jnp.int32),
            conf=jnp.zeros((K,), jnp.float32),
            cls=jnp.zeros((K,), jnp.float32),
            det_ind=jnp.full((K,), -1, jnp.int32),
            hits=jnp.zeros((K,), jnp.int32),
            age=jnp.zeros((K,), jnp.int32),
            tsu=jnp.zeros((K,), jnp.int32),
            feat=jnp.zeros((K, D), jnp.float32),
            has_feat=jnp.zeros((K,), bool),
            gallery=jnp.zeros((K, B, D), jnp.float32),
            gallery_count=jnp.zeros((K,), jnp.int32),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def step_fn(state: StrongSortState, dets, det_mask, embs=None, warp=None):
        N = dets.shape[0]
        frame = state.frame_count + 1
        det_conf = dets[:, 4]
        det_xyxy = dets[:, :4]
        det_xyah = boxes.xyxy2xyah(det_xyxy)

        valid = det_mask & (det_conf >= cfg.min_conf)
        if embs is None:
            det_feat = jnp.zeros((N, D), jnp.float32)
        else:
            det_feat = embs[:, :D]
        det_feat_norm = jnp.linalg.norm(det_feat, axis=-1)
        det_has_feat = valid & (det_feat_norm > 1e-10)
        det_feat_n = det_feat / jnp.where(
            det_feat_norm > 1e-10, det_feat_norm, 1.0
        )[:, None]

        occupied = state.sstate != FREE
        mean, cov = state.mean, state.cov

        # --- camera update before predict (strongsort.cpp:915-921) -------
        if warp is not None:
            do_cmc = jnp.any(valid)
            tlwh = boxes.xyah2tlwh(mean[:, :4])
            tlbr = boxes.tlwh2xyxy(tlwh)
            ones = jnp.ones_like(tlbr[:, :1])
            p1 = jnp.concatenate([tlbr[:, 0:2], ones], 1) @ warp.T
            p2 = jnp.concatenate([tlbr[:, 2:4], ones], 1) @ warp.T
            w = p2[:, 0] - p1[:, 0]
            h = p2[:, 1] - p1[:, 1]
            new_pos = jnp.stack(
                [p1[:, 0] + w / 2.0, p1[:, 1] + h / 2.0,
                 w / jnp.where(h != 0, h, 1.0), h],
                axis=-1,
            )
            apply = occupied & do_cmc
            mean = jnp.where(apply[:, None], mean.at[:, :4].set(new_pos), mean)

        # --- predict (strongsort.cpp:139-145) ----------------------------
        pmean, pcov = kf_xyah.predict(mean, cov)
        mean = jnp.where(occupied[:, None], pmean, mean)
        cov = jnp.where(occupied[:, None, None], pcov, cov)
        age = jnp.where(occupied, state.age + 1, state.age)
        tsu = jnp.where(occupied, state.tsu + 1, state.tsu)

        confirmed = state.sstate == CONFIRMED
        tentative = state.sstate == TENTATIVE

        # --- stage A: gallery cosine + Mahalanobis gate ------------------
        # gallery min-distance: (K, B, D) x (N, D) -> (K, B, N) -> min_B
        g_norm = jnp.linalg.norm(state.gallery, axis=-1, keepdims=True)
        g_n = state.gallery / jnp.where(g_norm > 1e-10, g_norm, 1.0)
        sims = jnp.einsum("kbd,nd->kbn", g_n, det_feat_n)
        dists = 1.0 - sims  # (K, B, N)
        slot_idx = jnp.arange(B)[None, :, None]
        have = slot_idx < jnp.minimum(state.gallery_count, B)[:, None, None]
        dists = jnp.where(have, dists, jnp.inf)
        nn_cost = jnp.min(dists, axis=1)  # (K, N)
        nn_cost = jnp.where(
            state.gallery_count[:, None] > 0, nn_cost, INFTY_COST
        )
        # dets without features behave like the reference's zero rows:
        # cosine vs zero vector -> distance 1
        nn_cost = jnp.where(
            det_has_feat[None, :], nn_cost,
            jnp.where(state.gallery_count[:, None] > 0, 1.0, INFTY_COST),
        )
        maha = kf_xyah.gating_distance(mean, cov, det_xyah[None, :, :])
        costA = jnp.where(maha > GATING_THRESHOLD, INFTY_COST, nn_cost)
        costA = cfg.mc_lambda * costA + (1.0 - cfg.mc_lambda) * maha
        # threshold clamp (strongsort.cpp:374-377)
        costA = jnp.where(
            costA > cfg.max_cos_dist, cfg.max_cos_dist + 1e-5, costA
        )
        r2cA, c2rA = solve_lap_masked(
            costA, confirmed, valid, cfg.max_cos_dist, impl=cfg.lap_impl
        )
        mA = r2cA >= 0

        # --- stage B: IoU on unconfirmed + just-missed confirmed ---------
        rowsB = tentative | (confirmed & ~mA & (tsu == 1))
        colsB = valid & (c2rA < 0)
        trk_xyxy = boxes.xyah2xyxy(mean[:, :4])
        costB = 1.0 - iou_batch(trk_xyxy, det_xyxy)
        costB = jnp.where((tsu > 1)[:, None], INFTY_COST, costB)
        r2cB, c2rB = solve_lap_masked(
            costB, rowsB, colsB, cfg.max_iou_dist, impl=cfg.lap_impl
        )
        mB = r2cB >= 0

        match = jnp.where(mA, r2cA, jnp.where(mB, r2cB, -1))
        m = match >= 0
        j = jnp.clip(match, 0, N - 1)

        # --- Track.update (strongsort.cpp:147-187) -----------------------
        z = det_xyah[j]
        umean, ucov = kf_xyah.update(mean, cov, z, nsa_conf=dets[j][:, 4])
        mean = jnp.where(m[:, None], umean, mean)
        cov = jnp.where(m[:, None, None], ucov, cov)
        conf = jnp.where(m, dets[j][:, 4], state.conf)
        cls = jnp.where(m, dets[j][:, 5], state.cls)
        det_ind = jnp.where(m, j, state.det_ind)
        hits = jnp.where(m, state.hits + 1, state.hits)
        tsu = jnp.where(m, 0, tsu)

        # EMA smoothed feature
        dfeat = det_feat_n[j]
        dgood = det_has_feat[j]
        smoothed = cfg.ema_alpha * state.feat + (1.0 - cfg.ema_alpha) * dfeat
        sm_norm = jnp.linalg.norm(smoothed, axis=-1, keepdims=True)
        smoothed = smoothed / jnp.where(sm_norm > 1e-10, sm_norm, 1.0)
        new_feat = jnp.where(state.has_feat[:, None], smoothed, dfeat)
        upd_feat = m & dgood
        feat = jnp.where(upd_feat[:, None], new_feat, state.feat)
        has_feat = state.has_feat | upd_feat

        sstate = state.sstate
        sstate = jnp.where(
            m & tentative & (hits >= cfg.n_init), CONFIRMED, sstate
        )

        # --- mark_missed (strongsort.cpp:189-195) ------------------------
        missed = occupied & ~m
        sstate = jnp.where(missed & tentative, FREE, sstate)
        sstate = jnp.where(
            missed & confirmed & (tsu > cfg.max_age), FREE, sstate
        )

        # --- births (tentative, hits=1, age=1; strongsort.cpp:46-91) -----
        u_det = valid & (c2rA < 0) & (c2rB < 0)
        free = sstate == FREE
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
        bmean, bcov = kf_xyah.initiate(det_xyah[bdet])
        mean = jnp.where(births[:, None], bmean, mean)
        cov = jnp.where(births[:, None, None], bcov, cov)
        conf = jnp.where(births, brow[:, 4], conf)
        cls = jnp.where(births, brow[:, 5], cls)
        det_ind = jnp.where(births, bdet, det_ind)
        hits = jnp.where(births, 1, hits)
        age = jnp.where(births, 1, age)
        tsu = jnp.where(births, 0, tsu)
        sstate = jnp.where(births, TENTATIVE, sstate)
        feat = jnp.where(births[:, None], det_feat_n[bdet], feat)
        has_feat = jnp.where(births, det_has_feat[bdet], has_feat)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            n_new, jnp.sum(free.astype(jnp.int32))
        )

        # --- gallery partial_fit (strongsort.cpp:639-661, 213-238):
        #     every confirmed track appends its current smoothed feature;
        #     freed/reborn slots reset their ring --------------------------
        gallery = jnp.where(births[:, None, None], 0.0, state.gallery)
        gallery_count = jnp.where(births, 0, state.gallery_count)
        confirmed_now = sstate == CONFIRMED
        appending = confirmed_now & has_feat
        slot = gallery_count % B
        gallery = jnp.where(
            appending[:, None, None],
            gallery.at[jnp.arange(K), slot].set(feat),
            gallery,
        )
        gallery_count = jnp.where(appending, gallery_count + 1, gallery_count)

        # --- output (strongsort.cpp:982-1002) ----------------------------
        out_mask = confirmed_now & (tsu < 1)
        out = jnp.concatenate(
            [
                boxes.xyah2xyxy(mean[:, :4]),
                tid[:, None].astype(jnp.float32),
                conf[:, None],
                cls[:, None],
                det_ind[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )

        new_state = StrongSortState(
            mean=mean, cov=cov, sstate=sstate, tid=tid, conf=conf, cls=cls,
            det_ind=det_ind, hits=hits, age=age, tsu=tsu, feat=feat,
            has_feat=has_feat, gallery=gallery, gallery_count=gallery_count,
            next_id=next_id, frame_count=frame,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("strongsort")
class StrongSORT(BaseTrackerWrapper):
    """Host-facing StrongSORT (reference: strongsort.hpp:305-324)."""

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
        min_conf: float = 0.1,
        max_cos_dist: float = 0.2,
        max_iou_dist: float = 0.7,
        n_init: int = 3,
        nn_budget: int = 100,
        mc_lambda: float = 0.98,
        ema_alpha: float = 0.9,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
        emb_dim: int = 1,
        gallery_cap: int = 100,
    ):
        super().__init__(max_dets=max_dets, emb_dim=emb_dim)
        del per_class, nr_classes, asso_func, is_obb, use_half, use_gpu
        self._cfg_kw = dict(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            min_conf=min_conf,
            max_cos_dist=max_cos_dist,
            max_iou_dist=max_iou_dist,
            n_init=n_init,
            nn_budget=nn_budget,
            mc_lambda=mc_lambda,
            ema_alpha=ema_alpha,
            gallery_cap=gallery_cap,
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self.reid_weights = reid_weights
        self._reid = None
        self._cmc = None
        self._build(emb_dim)

    def _build(self, emb_dim: int):
        self.cfg = StrongSortConfig(**self._cfg_kw, emb_dim=emb_dim)
        self._init, self._core_step = make_strongsort(self.cfg)
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
        if (
            (embs_arr is None or embs_arr.size == 0)
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
        # ECC on every frame once tracks exist (strongsort.cpp:915-921)
        if img is None or self._state is None:
            return None
        import numpy as np

        if not bool(np.asarray(self._state.sstate != 0).any()):
            return None
        if self._cmc is None:
            from motcpp_tpu.motion.cmc import ECC

            self._cmc = ECC()
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
