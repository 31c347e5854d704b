"""ByteTrack — two-stage high/low-score association, TPU-native.

Functional re-design of the reference tracker (reference:
src/trackers/bytetrack.cpp:130-706, include/motcpp/trackers/
bytetrack.hpp:97-110). The C++ list algebra (active/lost/removed vectors,
joint_/sub_/remove_duplicate_stracks) collapses into ONE fixed-capacity
slot array with a per-slot lifecycle code {FREE, TRACKED, LOST} plus an
``is_activated`` flag; all three association rounds are masked JV solves
on the same (K, N) layout.

Replicated reference behaviors (incl. its divergences from the original
Python ByteTrack — this build targets the C++ semantics):
  * det split by STRICT inequalities: high ``conf > track_thresh``,
    second ``min_conf < conf < track_thresh`` (bytetrack.cpp:189-193) —
    conf exactly equal to track_thresh lands in neither bucket
  * predictions are computed on pool *copies* and only committed for
    matched tracks (bytetrack.cpp:352-354, 422-424); unmatched tracks
    keep their last-updated state, so lost tracks do not accumulate
    motion extrapolation across frames
  * stage 2 uses the *unpredicted* track boxes for its IoU cost
    (bytetrack.cpp:388-397 reads r_tracked ptrs into originals)
  * stage 2 lost-marking and stage 3 unconfirmed-removal only run when
    both sides are non-empty (bytetrack.cpp:387, 455); otherwise
    unmatched tracks stay as they are
  * unconfirmed tracks are never predicted (only strack_pool is)
  * lost buffer: removed when frame - last_update > max_time_lost with
    max_time_lost = int(frame_rate / 30 * track_buffer)
    (bytetrack.cpp:141-142, 557-562)
  * duplicate removal between final tracked and lost sets at IoU-dist
    < 0.15, keeping the longer-lived track (bytetrack.cpp:659-706)
  * output = all TRACKED slots with is_activated, box from the current
    mean — including stale zombies when stage 2 was skipped
    (bytetrack.cpp:589-618)
  * ctor forces det_thresh = track_thresh (bytetrack.cpp:145)
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
from motcpp_tpu.ops.kalman.gaussian import kf_xyah
from motcpp_tpu.ops.lap import solve_lap_masked
from motcpp_tpu.ops.matching import fuse_score

FREE = 0
TRACKED = 1
LOST = 2


@dataclasses.dataclass(frozen=True)
class ByteTrackConfig:
    """Reference defaults: bytetrack.hpp:97-110."""

    det_thresh: float = 0.3  # overridden to track_thresh like the ctor
    max_age: int = 30
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    min_conf: float = 0.1
    track_thresh: float = 0.45
    match_thresh: float = 0.8
    track_buffer: int = 25
    frame_rate: int = 30
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"

    @property
    def max_time_lost(self) -> int:
        return int(self.frame_rate / 30.0 * self.track_buffer)


class ByteState(NamedTuple):
    mean: jnp.ndarray  # (K, 8) XYAH KF mean
    cov: jnp.ndarray  # (K, 8, 8)
    tstate: jnp.ndarray  # (K,) int32 in {FREE, TRACKED, LOST}
    is_activated: jnp.ndarray  # (K,) bool
    tid: jnp.ndarray  # (K,) int32
    conf: jnp.ndarray
    cls: jnp.ndarray
    det_ind: jnp.ndarray  # (K,) int32
    start_frame: jnp.ndarray  # (K,) int32
    last_frame: jnp.ndarray  # (K,) int32 — frame of last update (end_frame)
    next_id: jnp.ndarray  # ()
    frame_id: jnp.ndarray  # ()


def _xyah_of_dets(det_rows):
    return boxes.xyxy2xyah(det_rows[:, :4])


def _birth_slots(free, cand, K, N):
    """Allocate candidate dets (mask over N) to free slots (mask over K)
    in detection order; returns (births mask (K,), det_idx (K,), rank (K,))."""
    det_rank = jnp.cumsum(cand.astype(jnp.int32)) - 1
    slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    n_cand = jnp.sum(cand.astype(jnp.int32))
    pos_by_rank = (
        jnp.full((K,), N, jnp.int32)
        .at[jnp.where(cand, det_rank, K)]
        .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )
    births = free & (slot_rank < n_cand)
    det_idx = jnp.where(births, pos_by_rank[jnp.clip(slot_rank, 0, K - 1)], 0)
    return births, det_idx, slot_rank


def make_bytetrack(cfg: ByteTrackConfig):
    K = cfg.max_tracks

    def init_fn() -> ByteState:
        return ByteState(
            mean=jnp.zeros((K, 8), jnp.float32),
            cov=jnp.broadcast_to(jnp.eye(8), (K, 8, 8)).astype(jnp.float32),
            tstate=jnp.zeros((K,), jnp.int32),
            is_activated=jnp.zeros((K,), bool),
            tid=jnp.zeros((K,), jnp.int32),
            conf=jnp.zeros((K,), jnp.float32),
            cls=jnp.zeros((K,), jnp.float32),
            det_ind=jnp.full((K,), -1, jnp.int32),
            start_frame=jnp.zeros((K,), jnp.int32),
            last_frame=jnp.zeros((K,), jnp.int32),
            next_id=jnp.asarray(0, jnp.int32),
            frame_id=jnp.asarray(0, jnp.int32),
        )

    def step_fn(state: ByteState, dets, det_mask, embs=None):
        del embs
        N = dets.shape[0]
        frame = state.frame_id + 1
        det_conf = dets[:, 4]
        det_xyxy = dets[:, :4]

        # --- det splits (strict, bytetrack.cpp:189-193) ------------------
        high = det_mask & (det_conf > cfg.track_thresh)
        second = det_mask & (det_conf > cfg.min_conf) & (
            det_conf < cfg.track_thresh
        )

        tracked_m = (state.tstate == TRACKED) & state.is_activated
        unconf_m = (state.tstate == TRACKED) & ~state.is_activated
        lost_m = state.tstate == LOST
        pool_m = tracked_m | lost_m

        mean, cov = state.mean, state.cov
        conf, cls = state.conf, state.cls
        det_ind = state.det_ind
        tstate, is_act = state.tstate, state.is_activated
        last_frame, start_frame = state.last_frame, state.start_frame

        # --- predict pool copies (vh zeroed for non-Tracked,
        #     bytetrack.cpp:87-95) ----------------------------------------
        mean_in = mean.at[:, 7].set(
            jnp.where(tstate == TRACKED, mean[:, 7], 0.0)
        )
        pmean, pcov = kf_xyah.predict(mean_in, cov)
        pool_xyxy = boxes.xyah2xyxy(pmean[:, :4])

        # ================= stage 1: pool x high dets =====================
        cost1 = fuse_score(
            1.0 - iou_batch(pool_xyxy, det_xyxy), det_conf
        )
        r2c1, c2r1 = solve_lap_masked(
            cost1, pool_m, high, cfg.match_thresh, impl=cfg.lap_impl
        )
        m1 = r2c1 >= 0
        j1 = jnp.clip(r2c1, 0, N - 1)

        # ================= stages 2+3: one batched solve ==================
        # Stage 2 (leftover Tracked x low dets) and stage 3 (unconfirmed x
        # stage-1-leftover high dets) depend only on stage-1 results and
        # touch disjoint track rows (unconfirmed tracks are excluded from
        # both earlier row masks) and disjoint det columns, so they solve
        # as one vmapped batch — halving the sequential LAP launches per
        # frame. Bit-exact vs sequential solves: both auction impls
        # compute epsilon over mask-valid pairs only, and masked rows
        # never influence any impl's matching.
        r_tracked = tracked_m & ~m1
        gate2 = jnp.any(second) & jnp.any(r_tracked)
        # stage-2 cost from UNPREDICTED boxes (bytetrack.cpp:388-397),
        # stage-3 cost from unconfirmed tracks' current means
        # (bytetrack.cpp:445-530): every row in either solve's mask
        # (leftover Tracked, unconfirmed) is untouched by stage 1's
        # update, so reading the pre-update means here is identical to
        # the reference's sequential reads.
        orig_xyxy = boxes.xyah2xyxy(mean[:, :4])
        iou_orig = 1.0 - iou_batch(orig_xyxy, det_xyxy)
        rem_high = high & (c2r1 < 0)
        gate3 = jnp.any(unconf_m) & jnp.any(rem_high)
        (r2c2, r2c3), (_, c2r3) = jax.vmap(
            lambda c, r, cm, t: solve_lap_masked(
                c, r, cm, t, impl=cfg.lap_impl
            )
        )(
            jnp.stack([iou_orig, fuse_score(iou_orig, det_conf)]),
            jnp.stack([r_tracked & gate2, unconf_m & gate3]),
            jnp.stack([second & gate2, rem_high & gate3]),
            jnp.asarray([0.5, 0.7], jnp.float32),
        )
        m2 = r2c2 >= 0
        m3 = r2c3 >= 0

        # ============ one merged KF update for all three stages ==========
        # Match rows are pairwise disjoint (m1 ⊆ pool, m2 ⊆ Tracked∖m1,
        # m3 ⊆ unconfirmed) and the Kalman update is elementwise per
        # track row, so update(select(inputs)) == select(update(inputs)):
        # one batched update replaces three, bit-exactly. Stages 1 and 2
        # update the predicted state (bytetrack.cpp:296-306, 367-440);
        # stage 3's unconfirmed tracks were never predicted
        # (bytetrack.cpp:445-530) and update their stored state.
        m12 = m1 | m2
        m123 = m12 | m3
        j123 = jnp.where(
            m1, j1, jnp.where(m2, jnp.clip(r2c2, 0, N - 1),
                              jnp.clip(r2c3, 0, N - 1))
        )
        drow = dets[j123]
        z = _xyah_of_dets(drow)
        base_mean = jnp.where(m12[:, None], pmean, mean)
        base_cov = jnp.where(m12[:, None, None], pcov, cov)
        u_mean, u_cov = kf_xyah.update(base_mean, base_cov, z)
        mean = jnp.where(m123[:, None], u_mean, mean)
        cov = jnp.where(m123[:, None, None], u_cov, cov)
        conf = jnp.where(m123, drow[:, 4], conf)
        cls = jnp.where(m123, drow[:, 5], cls)
        det_ind = jnp.where(m123, j123, det_ind)
        last_frame = jnp.where(m123, frame, last_frame)
        tstate = jnp.where(m1, TRACKED, tstate)  # re_activate of Lost
        is_act = is_act | m123  # update()/re_activate() both set it
        # unmatched leftover Tracked -> Lost (only when stage 2 ran)
        newly_lost = r_tracked & ~m2 & gate2
        tstate = jnp.where(newly_lost, LOST, tstate)
        # unmatched unconfirmed -> removed (free), only when stage 3 ran
        tstate = jnp.where(unconf_m & ~m3 & gate3, FREE, tstate)

        # ================= births =======================================
        u_det_final = rem_high & (c2r3 < 0)
        newt = u_det_final & (det_conf >= cfg.track_thresh)  # det_thresh
        free = tstate == FREE
        births, bdet, slot_rank = _birth_slots(free, newt, K, N)
        brows = dets[bdet]
        bmean, bcov = kf_xyah.initiate(_xyah_of_dets(brows))
        mean = jnp.where(births[:, None], bmean, mean)
        cov = jnp.where(births[:, None, None], bcov, cov)
        conf = jnp.where(births, brows[:, 4], conf)
        cls = jnp.where(births, brows[:, 5], cls)
        det_ind = jnp.where(births, bdet, det_ind)
        tstate = jnp.where(births, TRACKED, tstate)
        is_act = jnp.where(births, frame == 1, is_act)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            jnp.sum(newt.astype(jnp.int32)), jnp.sum(free.astype(jnp.int32))
        )
        start_frame = jnp.where(births, frame, start_frame)
        last_frame = jnp.where(births, frame, last_frame)

        # ================= lost aging (bytetrack.cpp:557-562) ============
        aged = (tstate == LOST) & (frame - last_frame > cfg.max_time_lost)
        tstate = jnp.where(aged, FREE, tstate)

        # ================= duplicate removal =============================
        cur_xyxy = boxes.xyah2xyxy(mean[:, :4])
        trk_now = tstate == TRACKED
        lost_now = tstate == LOST
        pd = 1.0 - iou_batch(cur_xyxy, cur_xyxy)  # (K, K)
        pair = trk_now[:, None] & lost_now[None, :] & (pd < 0.15)
        timep = (last_frame - start_frame)[:, None]
        timeq = (last_frame - start_frame)[None, :]
        dup_lost = jnp.any(pair & (timep > timeq), axis=0)  # cols to drop
        dup_trk = jnp.any(pair & (timep <= timeq), axis=1)  # rows to drop
        tstate = jnp.where(dup_lost | dup_trk, FREE, tstate)

        # ================= output ========================================
        out_mask = (tstate == TRACKED) & is_act
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

        new_state = ByteState(
            mean=mean,
            cov=cov,
            tstate=tstate,
            is_activated=is_act,
            tid=tid,
            conf=conf,
            cls=cls,
            det_ind=det_ind,
            start_frame=start_frame,
            last_frame=last_frame,
            next_id=next_id,
            frame_id=frame,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("bytetrack")
class ByteTrack(BaseTrackerWrapper):
    """Host-facing ByteTrack (reference: bytetrack.hpp:97-110 defaults;
    eval-tool construction motcpp_eval.cpp)."""

    def __init__(
        self,
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
        track_thresh: float = 0.45,
        match_thresh: float = 0.8,
        track_buffer: int = 25,
        frame_rate: int = 30,
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
    ):
        super().__init__(max_dets=max_dets)
        del per_class, nr_classes, asso_func, is_obb
        self.cfg = ByteTrackConfig(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            min_conf=min_conf,
            track_thresh=track_thresh,
            match_thresh=match_thresh,
            track_buffer=track_buffer,
            frame_rate=frame_rate,
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self._init, self._core_step = make_bytetrack(self.cfg)

    def _init_state(self):
        return self._init()

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask)
