"""BoT-SORT — ByteTrack skeleton + ReID fusion + camera-motion warp.

Functional re-design of the reference tracker (reference:
src/trackers/botsort.cpp:14-845, include/motcpp/trackers/
botsort.hpp:108-134). Same unified slot-array lifecycle as our
ByteTrack, with these reference-faithful differences:

  * empty detection input returns immediately — no frame increment, no
    prediction, no aging (botsort.cpp:267-269)
  * det split: first ``conf > track_high_thresh``, second
    ``track_low_thresh < conf <= track_high_thresh`` (botsort.cpp:373-380
    else-if makes the second bucket inclusive at the top)
  * XYWH Kalman filter; predictions are committed in place for the whole
    pool (pointer semantics, botsort.cpp:313-314) — unlike ByteTrack's
    copy-discard
  * GMC: a (2, 3) affine warp transforms the xyxy corners of every pool
    + unconfirmed track mean (position only, covariance untouched,
    botsort.cpp:60-91); warp source is motion.cmc.ECC or injection
  * stage-1 cost: min(iou_dist [opt. fuse_score], emb_dist/2 masked to 1
    where emb_dist/2 > appearance_thresh or iou_dist > proximity_thresh)
    (botsort.cpp:437-466); unconfirmed stage uses the same fusion with
    fuse_score always on (botsort.cpp:597-620)
  * track features: EMA smooth_feat with alpha 0.9, renormalized
    (botsort.cpp:158-169); only first-stage dets carry features
  * new tracks gated by ``conf >= new_track_thresh`` (botsort.cpp:659)
  * NO duplicate removal — the helper exists in the reference but is
    never called from update() (botsort.cpp:809-845)
  * ids restart at 1 per instance (next_id_ reset in ctor/reset,
    botsort.cpp:249-257)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.ops import boxes
from motcpp_tpu.ops.iou import iou_batch
from motcpp_tpu.ops.kalman.gaussian import kf_xywh
from motcpp_tpu.ops.lap import solve_lap_masked
from motcpp_tpu.ops.matching import fuse_score

FREE = 0
TRACKED = 1
LOST = 2


@dataclasses.dataclass(frozen=True)
class BotSortConfig:
    """Reference defaults: botsort.hpp:108-134."""

    det_thresh: float = 0.3
    max_age: int = 30
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    track_high_thresh: float = 0.5
    track_low_thresh: float = 0.1
    new_track_thresh: float = 0.6
    track_buffer: int = 30
    match_thresh: float = 0.8
    proximity_thresh: float = 0.5
    appearance_thresh: float = 0.25
    cmc_method: str = "ecc"
    frame_rate: int = 30
    fuse_first_associate: bool = False
    with_reid: bool = True
    emb_dim: int = 1
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"

    @property
    def max_time_lost(self) -> int:
        return int(self.frame_rate / 30.0 * self.track_buffer)


class BotState(NamedTuple):
    mean: jnp.ndarray  # (K, 8) XYWH KF mean
    cov: jnp.ndarray  # (K, 8, 8)
    tstate: jnp.ndarray  # (K,) {FREE, TRACKED, LOST}
    is_activated: jnp.ndarray
    tid: jnp.ndarray
    conf: jnp.ndarray
    cls: jnp.ndarray
    det_ind: jnp.ndarray
    start_frame: jnp.ndarray
    end_frame: jnp.ndarray
    feat: jnp.ndarray  # (K, D) EMA smooth feature (L2 normalized)
    has_feat: jnp.ndarray  # (K,) bool
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


_EMA_ALPHA = 0.9  # botsort.hpp feature alpha (botsort.cpp:163)


def _emb_distance(track_feat, det_feat):
    """Cosine distance on smooth features (utils/matching.cpp:79-91)."""
    tn = jnp.linalg.norm(track_feat, axis=-1, keepdims=True)
    dn = jnp.linalg.norm(det_feat, axis=-1, keepdims=True)
    sim = (track_feat @ det_feat.T) / (tn * dn.T + 1e-10)
    return jnp.maximum(0.0, 1.0 - sim)


def make_botsort(cfg: BotSortConfig):
    K = cfg.max_tracks
    D = cfg.emb_dim

    def init_fn() -> BotState:
        return BotState(
            mean=jnp.zeros((K, 8), jnp.float32),
            cov=jnp.broadcast_to(jnp.eye(8), (K, 8, 8)).astype(jnp.float32),
            tstate=jnp.zeros((K,), jnp.int32),
            is_activated=jnp.zeros((K,), bool),
            tid=jnp.zeros((K,), jnp.int32),
            conf=jnp.zeros((K,), jnp.float32),
            cls=jnp.zeros((K,), jnp.float32),
            det_ind=jnp.full((K,), -1, jnp.int32),
            start_frame=jnp.zeros((K,), jnp.int32),
            end_frame=jnp.zeros((K,), jnp.int32),
            feat=jnp.ones((K, D), jnp.float32),
            has_feat=jnp.zeros((K,), bool),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def _fused_cost(trk_xyxy, det_xyxy, det_conf, trk_feat, trk_has_feat,
                    det_feat, det_has_feat, use_fuse_score):
        """min(iou_dist, masked emb_dist/2) (botsort.cpp:437-466)."""
        iou_d = 1.0 - iou_batch(trk_xyxy, det_xyxy)
        iou_mask = iou_d > cfg.proximity_thresh
        base = fuse_score(iou_d, det_conf) if use_fuse_score else iou_d
        if not cfg.with_reid:
            return base
        emb_d = _emb_distance(trk_feat, det_feat) / 2.0
        # pairs lacking features behave like the reference's zero-filled
        # rows: distance from a zero vector -> cos sim 0 -> dist 1 -> /2
        no_feat = ~(trk_has_feat[:, None] & det_has_feat[None, :])
        emb_d = jnp.where(no_feat, 0.5, emb_d)
        emb_d = jnp.where(emb_d > cfg.appearance_thresh, 1.0, emb_d)
        emb_d = jnp.where(iou_mask, 1.0, emb_d)
        return jnp.minimum(base, emb_d)

    def _ema_feat(feat, has_feat, m, det_feat_rows, det_has_rows):
        """update_features (botsort.cpp:158-169)."""
        do = m & det_has_rows
        new = _EMA_ALPHA * feat + (1.0 - _EMA_ALPHA) * det_feat_rows
        new = jnp.where(has_feat[:, None], new, det_feat_rows)
        n = jnp.linalg.norm(new, axis=-1, keepdims=True)
        new = new / jnp.where(n > 0, n, 1.0)
        feat = jnp.where(do[:, None], new, feat)
        has_feat = has_feat | do
        return feat, has_feat

    def step_fn(state: BotState, dets, det_mask, embs=None, warp=None):
        N = dets.shape[0]
        det_conf = dets[:, 4]
        det_xyxy = dets[:, :4]
        if embs is None:
            dets_feat = jnp.ones((N, D), jnp.float32)
            det_has_feat = jnp.zeros((N,), bool)
        else:
            dets_feat = embs[:, :D]
            norms = jnp.linalg.norm(dets_feat, axis=-1, keepdims=True)
            dets_feat = dets_feat / jnp.where(norms > 0, norms, 1.0)
            det_has_feat = det_mask & (norms[:, 0] > 0)

        empty_input = ~jnp.any(det_mask)
        frame = state.frame_count + 1

        first = det_mask & (det_conf > cfg.track_high_thresh)
        second = det_mask & (det_conf > cfg.track_low_thresh) & (
            det_conf <= cfg.track_high_thresh
        )

        tracked_m = (state.tstate == TRACKED) & state.is_activated
        unconf_m = (state.tstate == TRACKED) & ~state.is_activated
        lost_m = state.tstate == LOST
        pool_m = tracked_m | lost_m

        mean, cov = state.mean, state.cov
        conf, cls = state.conf, state.cls
        det_ind = state.det_ind
        tstate, is_act = state.tstate, state.is_activated
        end_frame, start_frame = state.end_frame, state.start_frame
        feat, has_feat = state.feat, state.has_feat

        # --- predict pool IN PLACE (botsort.cpp:313-314) -----------------
        pmean, pcov = kf_xywh.predict(mean, cov)
        mean = jnp.where(pool_m[:, None], pmean, mean)
        cov = jnp.where(pool_m[:, None, None], pcov, cov)

        # --- GMC warp on pool + unconfirmed means (botsort.cpp:60-91) ----
        if warp is not None:
            occ = pool_m | unconf_m
            cur_xyxy = boxes.xywh2xyxy(mean[:, :4])
            ones = jnp.ones_like(cur_xyxy[:, :1])
            p1 = jnp.concatenate([cur_xyxy[:, 0:2], ones], axis=1)
            p2 = jnp.concatenate([cur_xyxy[:, 2:4], ones], axis=1)
            w1 = p1 @ warp.T  # (K, 2)
            w2 = p2 @ warp.T
            new_xyxy = jnp.concatenate([w1, w2], axis=1)
            new_xywh = boxes.xyxy2xywh(new_xyxy)
            mean = jnp.where(occ[:, None], mean.at[:, :4].set(new_xywh), mean)

        trk_xyxy = boxes.xywh2xyxy(mean[:, :4])

        # ================= stage 1: pool x first dets ====================
        cost1 = _fused_cost(
            trk_xyxy, det_xyxy, det_conf, feat, has_feat, dets_feat,
            det_has_feat, cfg.fuse_first_associate,
        )
        r2c1, c2r1 = solve_lap_masked(
            cost1, pool_m, first, cfg.match_thresh, impl=cfg.lap_impl
        )
        m1 = r2c1 >= 0
        j1 = jnp.clip(r2c1, 0, N - 1)

        # ============ stages 2+3: one batched solve =======================
        # Same structure as bytetrack.py: both stages depend only on
        # stage-1 results, their row sets (leftover Tracked, unconfirmed)
        # are disjoint from every row stage 1 writes, and their det
        # columns are disjoint — so they solve as one vmapped batch and
        # their costs read the post-predict means directly (identical on
        # all mask-valid rows to the reference's sequential reads,
        # botsort.cpp:498-614).
        r_tracked = tracked_m & ~m1
        gate2 = jnp.any(second) & jnp.any(r_tracked)
        cost2 = 1.0 - iou_batch(trk_xyxy, det_xyxy)
        rem_first = first & (c2r1 < 0)
        gate3 = jnp.any(unconf_m) & jnp.any(rem_first)
        cost3 = _fused_cost(
            trk_xyxy, det_xyxy, det_conf, feat, has_feat, dets_feat,
            det_has_feat, True,
        )
        (r2c2, r2c3), (_, c2r3) = jax.vmap(
            lambda c, r, cm, t: solve_lap_masked(
                c, r, cm, t, impl=cfg.lap_impl
            )
        )(
            jnp.stack([cost2, cost3]),
            jnp.stack([r_tracked & gate2, unconf_m & gate3]),
            jnp.stack([second & gate2, rem_first & gate3]),
            jnp.asarray([0.5, 0.7], jnp.float32),
        )
        m2 = r2c2 >= 0
        m3 = r2c3 >= 0

        # ============ one merged KF update for all three stages ==========
        # Match rows are pairwise disjoint and every stage updates the
        # in-place-predicted state, so one batched update over the merged
        # match map is bit-exact vs three sequential updates.
        m123 = (m1 | m2) | m3
        j123 = jnp.where(
            m1, j1, jnp.where(m2, jnp.clip(r2c2, 0, N - 1),
                              jnp.clip(r2c3, 0, N - 1))
        )
        drow = dets[j123]
        z = boxes.xyxy2xywh(drow[:, :4])
        um, uc = kf_xywh.update(mean, cov, z)
        mean = jnp.where(m123[:, None], um, mean)
        cov = jnp.where(m123[:, None, None], uc, cov)
        conf = jnp.where(m123, drow[:, 4], conf)
        cls = jnp.where(m123, drow[:, 5], cls)
        det_ind = jnp.where(m123, j123, det_ind)
        end_frame = jnp.where(m123, frame, end_frame)
        tstate = jnp.where(m1, TRACKED, tstate)  # re_activate of Lost
        is_act = is_act | m123
        # feature EMA only for stages 1 and 3 — second-stage dets carry
        # no features (botsort.cpp:507-511)
        m13 = m1 | m3
        feat, has_feat = _ema_feat(
            feat, has_feat, m13, dets_feat[j123], det_has_feat[j123]
        )
        # unmatched leftover Tracked -> Lost (only when stage 2 ran)
        newly_lost = r_tracked & ~m2 & gate2
        tstate = jnp.where(newly_lost, LOST, tstate)
        tstate = jnp.where(unconf_m & ~m3 & gate3, FREE, tstate)

        # ================= births =======================================
        u_det_final = rem_first & (c2r3 < 0)
        newt = u_det_final & (det_conf >= cfg.new_track_thresh)
        free = tstate == FREE
        det_rank = jnp.cumsum(newt.astype(jnp.int32)) - 1
        slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        n_new = jnp.sum(newt.astype(jnp.int32))
        pos_by_rank = (
            jnp.full((K,), N, jnp.int32)
            .at[jnp.where(newt, det_rank, K)]
            .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        )
        births = free & (slot_rank < n_new)
        bdet = jnp.where(births, pos_by_rank[jnp.clip(slot_rank, 0, K - 1)], 0)
        brow = dets[bdet]
        bmean, bcov = kf_xywh.initiate(boxes.xyxy2xywh(brow[:, :4]))
        mean = jnp.where(births[:, None], bmean, mean)
        cov = jnp.where(births[:, None, None], bcov, cov)
        conf = jnp.where(births, brow[:, 4], conf)
        cls = jnp.where(births, brow[:, 5], cls)
        det_ind = jnp.where(births, bdet, det_ind)
        tstate = jnp.where(births, TRACKED, tstate)
        is_act = jnp.where(births, frame == 1, is_act)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            n_new, jnp.sum(free.astype(jnp.int32))
        )
        start_frame = jnp.where(births, frame, start_frame)
        end_frame = jnp.where(births, frame, end_frame)
        feat = jnp.where(births[:, None], dets_feat[bdet], feat)
        has_feat = jnp.where(births, det_has_feat[bdet], has_feat)

        # ================= lost aging (botsort.cpp:669-676) ==============
        aged = (tstate == LOST) & (frame - end_frame > cfg.max_time_lost)
        tstate = jnp.where(aged, FREE, tstate)

        # ================= output (no duplicate removal) =================
        out_mask = (tstate == TRACKED) & is_act
        out = jnp.concatenate(
            [
                boxes.xywh2xyxy(mean[:, :4]),
                tid[:, None].astype(jnp.float32),
                conf[:, None],
                cls[:, None],
                det_ind[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )

        new_state = BotState(
            mean=mean, cov=cov, tstate=tstate, is_activated=is_act, tid=tid,
            conf=conf, cls=cls, det_ind=det_ind, start_frame=start_frame,
            end_frame=end_frame, feat=feat, has_feat=has_feat,
            next_id=next_id, frame_count=frame,
        )

        # --- empty-input early return (botsort.cpp:267-269): state
        #     passthrough, nothing emitted, frame NOT incremented ---------
        final_state = jax.tree_util.tree_map(
            lambda old, new: jnp.where(empty_input, old, new), state, new_state
        )
        out_mask = jnp.where(empty_input, False, out_mask)
        return final_state, (out, out_mask)

    return init_fn, step_fn


@register("botsort")
class BotSort(BaseTrackerWrapper):
    """Host-facing BoT-SORT (reference: botsort.hpp:108-134 defaults)."""

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
        track_high_thresh: float = 0.5,
        track_low_thresh: float = 0.1,
        new_track_thresh: float = 0.6,
        track_buffer: int = 30,
        match_thresh: float = 0.8,
        proximity_thresh: float = 0.5,
        appearance_thresh: float = 0.25,
        cmc_method: str = "ecc",
        frame_rate: int = 30,
        fuse_first_associate: bool = False,
        with_reid: bool = True,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
        emb_dim: int = 1,
    ):
        super().__init__(max_dets=max_dets, emb_dim=emb_dim)
        del per_class, nr_classes, asso_func, is_obb, use_half, use_gpu
        self._cfg_kw = dict(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            track_high_thresh=track_high_thresh,
            track_low_thresh=track_low_thresh,
            new_track_thresh=new_track_thresh,
            track_buffer=track_buffer,
            match_thresh=match_thresh,
            proximity_thresh=proximity_thresh,
            appearance_thresh=appearance_thresh,
            cmc_method=cmc_method,
            frame_rate=frame_rate,
            fuse_first_associate=fuse_first_associate,
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
        self.cfg = BotSortConfig(**self._cfg_kw, emb_dim=emb_dim)
        self._init, self._core_step = make_botsort(self.cfg)
        self._jit_step = None

    def update(self, dets, img=None, embs=None, warp=None):
        import numpy as np

        dets = np.asarray(dets, np.float32)
        # reference early-returns on truly empty input without frame
        # bookkeeping (botsort.cpp:267-269)
        if dets.size == 0:
            return np.zeros((0, 8), np.float32)
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
            and self.cfg.with_reid
            and self.reid_weights
            and img is not None
        ):
            embs_arr = self._reid_features(dets, img)
            if embs_arr is not None and embs_arr.shape[1] != self.cfg.emb_dim:
                self.emb_dim = embs_arr.shape[1]
                self._build(embs_arr.shape[1])
        return super().update(dets, img, embs_arr, warp=warp)

    def _compute_warp(self, img, dets):
        # GMC via ECC (botsort.cpp:239-242, 316-324)
        if img is None or self.cfg.cmc_method not in ("ecc", "sof", "sof_jax"):
            return None
        if self._cmc is None:
            from motcpp_tpu.motion.cmc import create_cmc

            self._cmc = create_cmc(self.cfg.cmc_method)
        return None if self._cmc is None else self._cmc.apply(img, dets)

    def _reid_features(self, dets, img):
        if self._reid is None:
            from motcpp_tpu.appearance.reid import ReIDBackend

            self._reid = ReIDBackend(self.reid_weights)
        return self._reid.get_features(dets[:, :4], img)

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask, embs, warp=warp)

    def _init_state(self):
        return self._init()
