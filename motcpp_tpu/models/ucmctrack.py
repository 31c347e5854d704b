"""UCMCTrack — ground-plane Mahalanobis tracking, TPU-native.

Functional re-design of the reference tracker (reference:
src/trackers/ucmc.cpp:16-574, include/motcpp/trackers/ucmc.hpp). Each
track runs a constant-velocity ground-plane Kalman filter with state
[x, vx, y, vy]; detections are projected to the ground plane through
the camera calibration (Ki 3x4, Ko 4x4 -> A, InvA) with Jacobian error
propagation of a box-size-dependent pixel noise, or to a scaled image
plane when no calibration is given (ucmc.cpp:92-140).

Replicated reference behaviors:
  * association cost = Mahalanobis + ln|S| with the per-detection
    mapped measurement noise (ucmc.cpp:202-212)
  * stage 1: high dets (conf >= high_score) x Confirmed+Coasted @ a1;
    stage 2: low dets x leftovers @ a2, unmatched -> Coasted
    (ucmc.cpp:345-450); stage 3: leftover high dets x Tentative @ a1
    with birth_count confirmation at 2 (ucmc.cpp:456-514)
  * leftover high dets birth Tentative tracks; every frame death_count
    increments for ALL tracks (matched ones reset to 0 first, so they
    end the frame at 1); Coasted die at death >= max_age, Tentative at
    death >= 2 (ucmc.cpp:531-548)
  * output: Confirmed tracks matched THIS frame, emitting the raw
    detection box/conf/cls (not the KF state) (ucmc.cpp:307-331)
  * ids from 1 (++tracker_count, ucmc.cpp:523)

Precision note: the reference computes in double; this build uses f32
(ground-plane coordinates are O(10), and the log-det term is well
scaled), which holds metric parity well within the 0.1 target band.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from motcpp_tpu.models import register
from motcpp_tpu.models.base import BaseTrackerWrapper
from motcpp_tpu.ops.lap import solve_lap_masked

FREE = 0
TENTATIVE = 1
CONFIRMED = 2
COASTED = 3


@dataclasses.dataclass(frozen=True)
class UCMCConfig:
    """Reference defaults (ucmc.hpp ctor; eval motcpp_eval.cpp:112-147)."""

    det_thresh: float = 0.3
    max_age: int = 30
    max_obs: int = 50
    min_hits: int = 3
    iou_threshold: float = 0.3
    a1: float = 100.0
    a2: float = 100.0
    wx: float = 5.0
    wy: float = 5.0
    vmax: float = 10.0
    dt: float = 1.0 / 30.0
    high_score: float = 0.5
    Ki: tuple = ()  # 12 values (3x4 row-major) or empty
    Ko: tuple = ()  # 16 values (4x4 row-major) or empty
    max_tracks: int = 256
    max_dets: int = 128
    lap_impl: str = "jv"

    def inv_A(self):
        """InvA (3, 3) from Ki*Ko dropping the z column (ucmc.cpp:57-82),
        or None for the image-space fallback."""
        if len(self.Ki) != 12 or len(self.Ko) != 16:
            return None
        Ki = np.asarray(self.Ki, np.float64).reshape(3, 4)
        Ko = np.asarray(self.Ko, np.float64).reshape(4, 4)
        KiKo = Ki @ Ko
        A = np.zeros((3, 3))
        A[:, :2] = KiKo[:, :2]
        A[:, 2] = KiKo[:, 3]
        return np.linalg.inv(A).astype(np.float32)


class UCMCState(NamedTuple):
    x: jnp.ndarray  # (K, 4) [x, vx, y, vy]
    P: jnp.ndarray  # (K, 4, 4)
    ustate: jnp.ndarray  # (K,)
    tid: jnp.ndarray
    death: jnp.ndarray
    birth: jnp.ndarray
    det_idx: jnp.ndarray  # (K,) original det index this frame or -1
    out_conf: jnp.ndarray
    out_cls: jnp.ndarray
    out_box: jnp.ndarray  # (K, 4) detection box of this frame's match
    next_id: jnp.ndarray
    frame_count: jnp.ndarray


def _map_dets(cfg: UCMCConfig, det_xyxy):
    """Project boxes to measurements y (N, 2) and noise R (N, 2, 2)
    (ucmc.cpp:85-140)."""
    x1, y1, x2, y2 = (det_xyxy[:, i] for i in range(4))
    w = x2 - x1
    h = y2 - y1
    cx = (x1 + x2) * 0.5
    bottom = y2
    invA = cfg.inv_A()
    if invA is None:
        scale = 0.01
        y = jnp.stack([cx * scale, bottom * scale], axis=-1)
        ex = jnp.clip(0.0005 * w, 0.02, 0.13)
        ey = jnp.clip(0.0005 * h, 0.02, 0.10)
        R = jnp.zeros((det_xyxy.shape[0], 2, 2))
        R = R.at[:, 0, 0].set(ex**2).at[:, 1, 1].set(ey**2)
        return y, R
    A = jnp.asarray(invA)
    uv1 = jnp.stack([cx, bottom, jnp.ones_like(cx)], axis=-1)  # (N, 3)
    b = uv1 @ A.T  # (N, 3)
    gamma = 1.0 / b[:, 2]
    xy = b[:, :2] * gamma[:, None]
    # Jacobian C = gamma*InvA[:2,:2] - gamma^2 * b[:2] InvA[2,:2]
    C = (
        gamma[:, None, None] * A[None, :2, :2]
        - (gamma**2)[:, None, None] * b[:, :2, None] * A[None, 2:3, :2]
    )  # (N, 2, 2)
    eu = jnp.clip(0.05 * w, 2.0, 13.0)
    ev = jnp.clip(0.05 * h, 2.0, 10.0)
    sig = jnp.zeros((det_xyxy.shape[0], 2, 2))
    sig = sig.at[:, 0, 0].set(eu**2).at[:, 1, 1].set(ev**2)
    R = jnp.einsum("nij,njk,nlk->nil", C, sig, C)
    return xy, R


def _inv2(S):
    """Closed-form 2x2 inverse and determinant."""
    a = S[..., 0, 0]
    b = S[..., 0, 1]
    c = S[..., 1, 0]
    d = S[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
    ) / det[..., None, None]
    return inv, det


def make_ucmctrack(cfg: UCMCConfig):
    K = cfg.max_tracks
    dt = cfg.dt
    # F, Q, H constants (ucmc.cpp:160-189)
    F = jnp.eye(4).at[0, 1].set(dt).at[2, 3].set(dt)
    G = jnp.asarray(
        [[0.5 * dt * dt, 0.0], [dt, 0.0], [0.0, 0.5 * dt * dt], [0.0, dt]],
        jnp.float32,
    )
    Q = G @ jnp.diag(jnp.asarray([cfg.wx, cfg.wy], jnp.float32)) @ G.T
    P0 = jnp.diag(
        jnp.asarray(
            [1.0, cfg.vmax**2 / 3.0, 1.0, cfg.vmax**2 / 3.0], jnp.float32
        )
    )

    def _pos(x):
        return x[..., jnp.asarray([0, 2])]

    def _dist(x, P, y, R, row_mask, col_mask):
        """(K, N) Mahalanobis + log|S| (ucmc.cpp:202-212)."""
        HPH = P[:, jnp.asarray([0, 2])][:, :, jnp.asarray([0, 2])]  # (K,2,2)
        S = HPH[:, None] + R[None, :]  # (K, N, 2, 2)
        Sinv, det = _inv2(S)
        diff = y[None, :, :] - _pos(x)[:, None, :]  # (K, N, 2)
        maha = jnp.einsum("kni,knij,knj->kn", diff, Sinv, diff)
        cost = maha + jnp.log(jnp.maximum(det, 1e-30))
        return jnp.where(row_mask[:, None] & col_mask[None, :], cost, 1e9)

    def _kf_update(x, P, y, R):
        HPH = P[:, jnp.asarray([0, 2])][:, :, jnp.asarray([0, 2])]
        S = HPH + R
        Sinv, _ = _inv2(S)
        from motcpp_tpu.ops.linalg import matmul_small

        PHt = P[:, :, jnp.asarray([0, 2])]  # (K, 4, 2)
        Kg = matmul_small(PHt, Sinv)
        innov = y - _pos(x)
        new_x = x + jnp.sum(Kg * innov[:, None, :], axis=-1)
        I = jnp.eye(4)
        KH = jnp.zeros((x.shape[0], 4, 4))
        KH = KH.at[:, :, 0].set(Kg[:, :, 0]).at[:, :, 2].set(Kg[:, :, 1])
        IKH = I[None] - KH
        # tiny contractions as unrolled FMAs (Joseph form kept verbatim)
        new_P = matmul_small(
            matmul_small(IKH, P), jnp.swapaxes(IKH, -1, -2)
        )
        new_P = new_P + matmul_small(
            matmul_small(Kg, R), jnp.swapaxes(Kg, -1, -2)
        )
        new_P = 0.5 * (new_P + jnp.swapaxes(new_P, -1, -2))
        return new_x, new_P

    def init_fn() -> UCMCState:
        return UCMCState(
            x=jnp.zeros((K, 4), jnp.float32),
            P=jnp.broadcast_to(P0, (K, 4, 4)).astype(jnp.float32),
            ustate=jnp.zeros((K,), jnp.int32),
            tid=jnp.zeros((K,), jnp.int32),
            death=jnp.zeros((K,), jnp.int32),
            birth=jnp.zeros((K,), jnp.int32),
            det_idx=jnp.full((K,), -1, jnp.int32),
            out_conf=jnp.zeros((K,), jnp.float32),
            out_cls=jnp.zeros((K,), jnp.float32),
            out_box=jnp.zeros((K, 4), jnp.float32),
            next_id=jnp.asarray(0, jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )

    def step_fn(state: UCMCState, dets, det_mask, embs=None):
        del embs  # ignored (ucmc.cpp:265-266)
        N = dets.shape[0]
        frame = state.frame_count + 1
        det_conf = dets[:, 4]
        det_xyxy = dets[:, :4]

        valid = det_mask & (det_conf >= cfg.det_thresh)
        high = valid & (det_conf >= cfg.high_score)
        low = valid & (det_conf < cfg.high_score)

        y, Rm = _map_dets(cfg, det_xyxy)

        occupied = state.ustate != FREE
        # predict all; det_idx reset (ucmc.cpp:356-360). A/B-measured:
        # strided slice-adds for F P F' lose to this einsum on the
        # interleaved [x,vx,y,vy] layout (strided VMEM updates), so the
        # 4x4 einsum stays.
        px = state.x @ F.T
        pP = jnp.einsum("ij,kjl,ml->kim", F, state.P, F) + Q
        x = jnp.where(occupied[:, None], px, state.x)
        P = jnp.where(occupied[:, None, None], pP, state.P)
        det_idx = jnp.full((K,), -1, jnp.int32)
        ustate = state.ustate
        death = state.death
        birth = state.birth
        out_conf, out_cls = state.out_conf, state.out_cls
        out_box = state.out_box

        conf_coast = (ustate == CONFIRMED) | (ustate == COASTED)

        # The (K, N) Mahalanobis+log|S| matrix builds ONCE for all three
        # stages: every stage's row set (confirmed+coasted, stage-1
        # leftovers, tentative) is untouched by the earlier stages'
        # updates, so the per-stage rebuilds of the reference
        # (ucmc.cpp:345-489) read identical values on all mask-valid
        # rows. Stages 2 and 3 (disjoint rows AND disjoint det columns,
        # both depending only on stage 1) solve as one vmapped batch,
        # and all three stages commit via ONE merged KF update —
        # bit-exact vs sequential (each row matched by at most one
        # stage; same pattern as bytetrack.py/ocsort.py).
        all_rows = jnp.ones((K,), bool)
        all_cols = jnp.ones((N,), bool)
        base_cost = _dist(x, P, y, Rm, all_rows, all_cols)

        # ---- stage 1: confirmed+coasted x high @ a1 ---------------------
        cost1 = jnp.where(
            conf_coast[:, None] & high[None, :], base_cost, 1e9
        )
        r2c1, c2r1 = solve_lap_masked(
            cost1, conf_coast, high, cfg.a1, impl=cfg.lap_impl
        )
        m1 = r2c1 >= 0
        j1 = jnp.clip(r2c1, 0, N - 1)

        # ---- stages 2+3 batched: leftovers x low @ a2, tentative x
        #      leftover high @ a1 -----------------------------------------
        remain = conf_coast & ~m1
        tent = state.ustate == TENTATIVE  # tentative entering this frame
        rem_high = high & (c2r1 < 0)
        (r2c2, r2c3), (_, c2r3) = jax.vmap(
            lambda r, c, t: solve_lap_masked(
                jnp.where(r[:, None] & c[None, :], base_cost, 1e9),
                r, c, t, impl=cfg.lap_impl,
            )
        )(
            jnp.stack([remain, tent]),
            jnp.stack([low, rem_high]),
            jnp.asarray([cfg.a2, cfg.a1], jnp.float32),
        )
        m2 = r2c2 >= 0
        m3 = r2c3 >= 0

        # ---- merged commit ----------------------------------------------
        m12 = m1 | m2
        m123 = m12 | m3
        j123 = jnp.where(
            m1, j1, jnp.where(m2, jnp.clip(r2c2, 0, N - 1),
                              jnp.clip(r2c3, 0, N - 1))
        )
        ux, uP = _kf_update(x, P, y[j123], Rm[j123])
        x = jnp.where(m123[:, None], ux, x)
        P = jnp.where(m123[:, None, None], uP, P)
        death = jnp.where(m123, 0, death)
        det_idx = jnp.where(m123, j123, det_idx)
        out_conf = jnp.where(m123, det_conf[j123], out_conf)
        out_cls = jnp.where(m123, dets[j123][:, 5], out_cls)
        out_box = jnp.where(m123[:, None], det_xyxy[j123], out_box)
        ustate = jnp.where(m12, CONFIRMED, ustate)
        ustate = jnp.where(remain & ~m2, COASTED, ustate)
        birth = jnp.where(m3, birth + 1, birth)
        promote = m3 & (birth >= 2)
        ustate = jnp.where(promote, CONFIRMED, ustate)
        birth = jnp.where(promote, 0, birth)

        # ---- births: leftover high dets -> tentative --------------------
        u_det = rem_high & (c2r3 < 0)
        free = ustate == FREE
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
        bx = jnp.zeros((K, 4), jnp.float32)
        bx = bx.at[:, 0].set(y[bdet][:, 0]).at[:, 2].set(y[bdet][:, 1])
        x = jnp.where(births[:, None], bx, x)
        P = jnp.where(births[:, None, None], P0, P)
        ustate = jnp.where(births, TENTATIVE, ustate)
        death = jnp.where(births, 0, death)
        birth = jnp.where(births, 0, birth)
        det_idx = jnp.where(births, bdet, det_idx)
        out_conf = jnp.where(births, det_conf[bdet], out_conf)
        out_cls = jnp.where(births, dets[bdet][:, 5], out_cls)
        out_box = jnp.where(births[:, None], det_xyxy[bdet], out_box)
        tid = jnp.where(births, state.next_id + 1 + slot_rank, state.tid)
        next_id = state.next_id + jnp.minimum(
            n_new, jnp.sum(free.astype(jnp.int32))
        )

        # ---- deaths: everyone's death_count increments (ucmc.cpp:531-548)
        alive = ustate != FREE
        death = jnp.where(alive, death + 1, death)
        kill = ((ustate == COASTED) & (death >= cfg.max_age)) | (
            (ustate == TENTATIVE) & (death >= 2)
        )
        ustate = jnp.where(kill, FREE, ustate)

        # ---- output: confirmed + matched this frame (ucmc.cpp:307-331) --
        out_mask = (ustate == CONFIRMED) & (det_idx >= 0)
        out = jnp.concatenate(
            [
                out_box,
                tid[:, None].astype(jnp.float32),
                out_conf[:, None],
                out_cls[:, None],
                det_idx[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )

        new_state = UCMCState(
            x=x, P=P, ustate=ustate, tid=tid, death=death, birth=birth,
            det_idx=det_idx, out_conf=out_conf, out_cls=out_cls,
            out_box=out_box, next_id=next_id, frame_count=frame,
        )
        return new_state, (out, out_mask)

    return init_fn, step_fn


@register("ucmctrack")
@register("ucmc")
class UCMCTrack(BaseTrackerWrapper):
    """Host-facing UCMCTrack (reference: ucmc.hpp ctor defaults; eval
    construction motcpp_eval.cpp:112-147)."""

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
        a1: float = 100.0,
        a2: float = 100.0,
        wx: float = 5.0,
        wy: float = 5.0,
        vmax: float = 10.0,
        dt: float = 1.0 / 30.0,
        high_score: float = 0.5,
        Ki=(),
        Ko=(),
        max_tracks: int = 256,
        max_dets: int = 128,
        lap_impl: str = "jv",
    ):
        super().__init__(max_dets=max_dets)
        del per_class, nr_classes, asso_func, is_obb
        self.cfg = UCMCConfig(
            det_thresh=det_thresh,
            max_age=max_age,
            max_obs=max_obs,
            min_hits=min_hits,
            iou_threshold=iou_threshold,
            a1=a1,
            a2=a2,
            wx=wx,
            wy=wy,
            vmax=vmax,
            dt=dt,
            high_score=high_score,
            Ki=tuple(Ki),
            Ko=tuple(Ko),
            max_tracks=max_tracks,
            max_dets=max_dets,
            lap_impl=lap_impl,
        )
        self._init, self._core_step = make_ucmctrack(self.cfg)

    def _init_state(self):
        return self._init()

    def _step(self, state, dets, det_mask, embs, warp):
        return self._core_step(state, dets, det_mask)
