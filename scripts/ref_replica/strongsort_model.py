#!/usr/bin/env python3
"""Controlled-ablation model of the reference StrongSORT's bookkeeping.

The same-scene replica comparison (docs/accuracy.md) shows the
reference binary posting 3,991 ID switches where this repo posts 102.
This script adjudicates WHY with a minimal, host-side NumPy mirror of
the reference's `Tracker::match`/`update` logic (reference:
src/trackers/strongsort.cpp:330-806) and two independent toggles.
Measured on the identical 600-frame no-pan scene (scored with
scripts/ref_replica/score.py):

  | configuration                         | HOTA  | IDSW | FP | FN   |
  |---------------------------------------|-------|------|----|------|
  | reference binary                      | 66.82 | 3991 | 92 | 5612 |
  | this model (defaults = both quirks)   | 66.82 | 3991 | 92 | 5612 |
  | model, --no-bugs (fallbacks off)      | 67.13 | 4097 | 93 | 5468 |
  | model, --true-maha (gating fixed)     | 79.10 |  103 |168 | 4715 |
  | this repo (models/strongsort.py)      | 79.50 |  102 |169 | 4575 |

The default model reproduces the reference binary DIGIT-EXACTLY on
every metric, so the two toggles are a controlled ablation of the real
implementation:

**Primary cause: the gating solve quirk (`--true-maha` toggles it).**
`BaseKalmanFilter::gating_distance` computes `z = chol.solve(d)` (the
FULL S^-1) and then `z.rowwise().squaredNorm()`
(kalman_filter.cpp:170-176), yielding d^T S^-2 d where Mahalanobis
needs the triangular half-solve (d^T S^-1 d). S's position diagonal is
O((h/20)^2) ~ 10^2, so the extra S^-1 shrinks every distance ~100x:
the chi2 gate at 9.4877 never fires and the mc_lambda blend term
vanishes. Association degrades to UNGATED appearance-only matching;
with realistic embedding noise, tracks teleport between objects and
duplicates multiply: that is the whole 3,991-IDSW profile. Fixing this
ONE line in the model (proper triangular solve) lands within one
switch of this repo (103 vs 102), WITH every other reference quirk
still in place.

**Secondary: the empty-list fallback family (`--no-bugs` toggles
it).** The port translated Python-DeepSORT's `if indices is None:
indices = arange(...)` into `if (indices.empty())`, conflating "not
provided" with "provided but empty" (strongsort.cpp:355-366
min_cost_matching, :429-441 matching_cascade, :542-553 iou_cost).
While NO confirmed track exists, the cascade's empty confirmed list
falls back to ALL tracks, every tentative reaches the IoU stage twice
(via `unconfirmed` AND via tsu==1 unmatched, strongsort.cpp:744-750),
one copy always lands in unmatched, and mark_missed deletes the
tentative the same frame it matched. On a steady scene nothing ever
confirms: the replica binary emits ZERO rows on a 30-frame 3-object
scene, and on the 600-frame scene first emits at frame 5, only after a
crowd overlap double-matches both copies (update runs twice, hits
+= 2, insta-confirm). Steady-state it also re-offers already-matched
detections to the IoU stage whenever the cascade matched everything
(the re-matches are deduplicated but the leftovers re-birth duplicate
tentatives). Net metric effect on this scene is small (IDSW 4097 vs
3991 with fallbacks off; the ungated matching dominates); the warm-up
deadlock is its clear signature.

**Retired explanation.** The earlier "noisier per-sample gallery"
prose is wrong: the reference stores only the EMA-smoothed feature
(strongsort.cpp:157-175) and re-appends it per frame budget-100
(:639-661), IDENTICAL semantics to this repo's gallery ring
(models/strongsort.py), and identical in this model under every
toggle.

Usage:
  python scripts/ref_replica/strongsort_model.py scene.bin out.txt \
      [--no-bugs] [--true-maha]
then score with scripts/ref_replica/score.py.
"""
from __future__ import annotations

import struct
import sys

import numpy as np
from scipy.optimize import linear_sum_assignment

INFTY = 1e5
GATING_THRESHOLD = 9.4877  # chi2inv95[4]

WP, WV = 1.0 / 20, 1.0 / 160  # DeepSORT XYAH noise weights

GATING_MODE = "ref"  # "ref" = d S^-2 d (the port's chol.solve quirk),
# "maha" = proper d S^-1 d via triangular solve (upstream DeepSORT)


# ----------------------------------------------------------------- KF
def kf_initiate(xyah):
    mean = np.zeros(8, np.float32)
    mean[:4] = xyah
    h = xyah[3]
    std = np.array([2 * WP * h, 2 * WP * h, 1e-2, 2 * WP * h,
                    10 * WV * h, 10 * WV * h, 1e-5, 10 * WV * h], np.float32)
    return mean, np.diag(std * std)


F = np.eye(8, dtype=np.float32)
F[:4, 4:] = np.eye(4, dtype=np.float32)
H = np.eye(4, 8, dtype=np.float32)


def kf_predict(mean, cov):
    h = mean[3]
    std = np.array([WP * h, WP * h, 1e-2, WP * h,
                    WV * h, WV * h, 1e-5, WV * h], np.float32)
    return F @ mean, F @ cov @ F.T + np.diag(std * std)


def _project(mean, cov, conf=0.0):
    h = mean[3]
    std = np.array([WP * h, WP * h, 1e-1, WP * h], np.float32)
    std = std * (1.0 - conf)  # NSA (kalman_filter.cpp:66-68)
    S = H @ cov @ H.T + np.diag(std * std)
    return H @ mean, S


def kf_update(mean, cov, z, conf):
    pm, S = _project(mean, cov, conf)
    K = np.linalg.solve(S.T, (cov @ H.T).T).T
    nm = mean + K @ (z - pm)
    return nm, cov - K @ S @ K.T


def kf_gating(mean, cov, Z):
    """GATING_MODE="ref": Eigen chol.solve applies the FULL S^-1, then
    rowwise().squaredNorm() squares it again; the reference's 'maha'
    metric is d^T S^-2 d (kalman_filter.cpp:170-176). "maha" solves the
    triangular factor only (upstream DeepSORT): d^T S^-1 d."""
    pm, S = _project(mean, cov)
    d = Z - pm[None, :]
    if GATING_MODE == "ref":
        z = np.linalg.solve(S, d.T).T
    else:
        L = np.linalg.cholesky(S)
        z = np.linalg.solve(L, d.T).T  # triangular: ||z||^2 = d S^-1 d
    return np.sum(z * z, axis=1)


# ------------------------------------------------------------- tracks
class Track:
    __slots__ = ("mean", "cov", "tid", "hits", "tsu", "state", "feat",
                 "conf", "cls", "det_ind")

    def __init__(self, xyah, tid, conf, cls, det_ind, feat):
        self.mean, self.cov = kf_initiate(xyah)
        self.tid = tid
        self.hits = 1
        self.tsu = 0
        self.state = "tent"
        self.conf, self.cls, self.det_ind = conf, cls, det_ind
        n = np.linalg.norm(feat)
        self.feat = (feat / n) if n > 1e-10 else None  # smoothed feature


def to_tlwh(track):
    cx, cy, a, h = track.mean[:4]
    w = a * h
    return np.array([cx - w / 2, cy - h / 2, w, h], np.float32)


def iou_row(tlwh, cands):
    x1 = np.maximum(tlwh[0], cands[:, 0])
    y1 = np.maximum(tlwh[1], cands[:, 1])
    x2 = np.minimum(tlwh[0] + tlwh[2], cands[:, 0] + cands[:, 2])
    y2 = np.minimum(tlwh[1] + tlwh[3], cands[:, 1] + cands[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    u = tlwh[2] * tlwh[3] + cands[:, 2] * cands[:, 3] - inter
    return np.where(u > 1e-6, inter / u, 0.0)


def lap(cost, limit):
    """LAPSolver cost-limit padding semantics (lap_solver.hpp:296-320)."""
    n, m = cost.shape
    big = np.full((n + m, n + m), limit / 2.0, np.float64)
    big[:n, :m] = cost
    big[n:, m:] = 0.0
    r, c = linear_sum_assignment(big)
    return [(i, j) for i, j in zip(r, c) if i < n and j < m]


def min_cost_matching(metric, max_dist, tracks, dets, track_idx, det_idx,
                      bugs):
    if bugs:  # the C++ port's empty -> all fallback
        if not track_idx:
            track_idx = list(range(len(tracks)))
        if not det_idx:
            det_idx = list(range(len(dets)))
    if not track_idx or not det_idx:
        return [], list(track_idx), list(det_idx)
    cost = metric(tracks, dets, track_idx, det_idx)
    cost = np.where(cost > max_dist, max_dist + 1e-5, cost)
    matches = []
    hit_r, hit_c = set(), set()
    for r, c in lap(cost, max_dist):
        if cost[r, c] <= max_dist:
            matches.append((track_idx[r], det_idx[c]))
            hit_r.add(r)
            hit_c.add(c)
    um_t = [track_idx[i] for i in range(len(track_idx)) if i not in hit_r]
    um_d = [det_idx[i] for i in range(len(det_idx)) if i not in hit_c]
    return matches, um_t, um_d


# ------------------------------------------------------------ tracker
class RefStrongSortModel:
    """Mirror of the reference Tracker (strongsort.cpp:591-806)."""

    def __init__(self, max_cos_dist=0.4, nn_budget=100, max_iou_dist=0.7,
                 max_age=30, n_init=3, mc_lambda=0.98, ema_alpha=0.9,
                 min_conf=0.6, bugs=True):
        self.p = dict(max_cos_dist=max_cos_dist, nn_budget=nn_budget,
                      max_iou_dist=max_iou_dist, max_age=max_age,
                      n_init=n_init, mc_lambda=mc_lambda,
                      ema_alpha=ema_alpha, min_conf=min_conf)
        self.bugs = bugs
        self.tracks: list[Track] = []
        self.samples: dict[int, list[np.ndarray]] = {}
        self.next_id = 1

    # --- metrics ------------------------------------------------------
    def _gated_metric(self, tracks, dets, t_idx, d_idx):
        feats = np.stack([dets[i][4] for i in d_idx])
        cost = np.empty((len(t_idx), len(d_idx)), np.float32)
        for r, ti in enumerate(t_idx):
            samp = self.samples.get(tracks[ti].tid)
            if samp:
                X = np.stack(samp)
                cost[r] = np.min(1.0 - X @ feats.T, axis=0)
            else:
                cost[r] = INFTY
        Z = np.stack([dets[i][5] for i in d_idx])  # xyah
        lam = self.p["mc_lambda"]
        for r, ti in enumerate(t_idx):
            g = kf_gating(tracks[ti].mean, tracks[ti].cov, Z)
            row = np.where(g > GATING_THRESHOLD, INFTY, cost[r])
            cost[r] = lam * row + (1 - lam) * g
        return cost

    @staticmethod
    def _iou_metric(tracks, dets, t_idx, d_idx):
        cands = np.stack([dets[i][0] for i in d_idx])  # tlwh
        cost = np.empty((len(t_idx), len(d_idx)), np.float32)
        for r, ti in enumerate(t_idx):
            if tracks[ti].tsu > 1:
                cost[r] = INFTY
            else:
                cost[r] = 1.0 - iou_row(to_tlwh(tracks[ti]), cands)
        return cost

    # --- match (strongsort.cpp:664-806) -------------------------------
    def _match(self, dets):
        tracks = self.tracks
        confirmed = [i for i, t in enumerate(tracks) if t.state == "conf"]
        unconfirmed = [i for i, t in enumerate(tracks) if t.state != "conf"]

        # matching_cascade: det_idx omitted -> all dets (both modes);
        # confirmed possibly [] -> ALL tracks only in bug mode
        m_a, um_t_a, um_d = min_cost_matching(
            self._gated_metric, self.p["max_cos_dist"], tracks, dets,
            confirmed, list(range(len(dets))), bugs=self.bugs)

        iou_cands = unconfirmed + [k for k in um_t_a if tracks[k].tsu == 1]
        um_t_a_filt = [k for k in um_t_a if tracks[k].tsu != 1]
        m_b, um_t_b, um_d = min_cost_matching(
            self._iou_metric, self.p["max_iou_dist"], tracks, dets,
            iou_cands, um_d, bugs=self.bugs)

        matches = list(m_a)
        seen_t = {t for t, _ in m_a}
        seen_d = {d for _, d in m_a}
        for t, d in m_b:
            if t not in seen_t and d not in seen_d:
                matches.append((t, d))
                seen_t.add(t)
                seen_d.add(d)
        um_t = sorted(set(um_t_a_filt) | set(um_t_b))
        return matches, um_t, um_d

    # --- per-frame update (strongsort.cpp:608-662, 872-1008) ----------
    def update(self, tlwhs, confs, clss, feats):
        keep = confs >= self.p["min_conf"]
        dets = [(tlwhs[i], confs[i], clss[i], i,
                 feats[i] / max(np.linalg.norm(feats[i]), 1e-10),
                 np.array([tlwhs[i][0] + tlwhs[i][2] / 2,
                           tlwhs[i][1] + tlwhs[i][3] / 2,
                           tlwhs[i][2] / max(tlwhs[i][3], 1e-6),
                           tlwhs[i][3]], np.float32))
                for i in range(len(tlwhs)) if keep[i]]
        for t in self.tracks:
            t.mean, t.cov = kf_predict(t.mean, t.cov)
            t.tsu += 1

        matches, um_t, um_d = self._match(dets)
        for ti, di in matches:  # duplicates possible in bug mode
            t = self.tracks[ti]
            d = dets[di]
            t.mean, t.cov = kf_update(t.mean, t.cov, d[5], d[1])
            if t.feat is None:
                t.feat = d[4]
            else:
                f = self.p["ema_alpha"] * t.feat + (1 - self.p["ema_alpha"]) * d[4]
                n = np.linalg.norm(f)
                if n > 1e-10:
                    t.feat = f / n
            t.conf, t.cls, t.det_ind = d[1], d[2], d[3]
            t.hits += 1
            t.tsu = 0
            if t.state == "tent" and t.hits >= self.p["n_init"]:
                t.state = "conf"
        for ti in um_t:
            t = self.tracks[ti]
            if t.state == "tent" or t.tsu > self.p["max_age"]:
                t.state = "del"
        for di in um_d:
            d = dets[di]
            self.tracks.append(
                Track(d[5], self.next_id, d[1], d[2], d[3], d[4]))
            self.next_id += 1
        self.tracks = [t for t in self.tracks if t.state != "del"]

        # partial_fit: every confirmed track re-appends its smoothed
        # feature each frame, budget-capped (strongsort.cpp:215-238)
        new_samples = {}
        for t in self.tracks:
            if t.state == "conf":
                s = self.samples.get(t.tid, [])
                if t.feat is not None:
                    s = (s + [t.feat])[-self.p["nn_budget"]:]
                new_samples[t.tid] = s
        self.samples = new_samples

        out = []
        for t in self.tracks:
            if t.state == "conf" and t.tsu < 1:
                tl = to_tlwh(t)
                out.append((t.tid, tl, t.conf))
        return out


def main():
    global GATING_MODE
    scene = sys.argv[1]
    out_path = sys.argv[2]
    bugs = "--no-bugs" not in sys.argv
    if "--true-maha" in sys.argv:
        GATING_MODE = "maha"
    f = open(scene, "rb")
    assert f.read(4) == b"MSCN"
    T, D = struct.unpack("<ii", f.read(8))
    model = RefStrongSortModel(bugs=bugs)
    rows = []
    for t in range(1, T + 1):
        (n,) = struct.unpack("<i", f.read(4))
        d = np.frombuffer(f.read(4 * n * 6), np.float32).reshape(n, 6)
        e = np.frombuffer(f.read(4 * n * D), np.float32).reshape(n, D)
        tlwhs = np.stack([d[:, 0], d[:, 1], d[:, 2] - d[:, 0],
                          d[:, 3] - d[:, 1]], axis=1) if n else np.zeros((0, 4))
        for tid, tl, conf in model.update(tlwhs, d[:, 4], d[:, 5], e):
            rows.append(f"{t},{tid},{tl[0]:.2f},{tl[1]:.2f},"
                        f"{tl[2]:.2f},{tl[3]:.2f},{conf:.2f},-1,-1,-1")
        if t % 100 == 0:
            print(f"frame {t}/{T} tracks={len(model.tracks)} "
                  f"next_id={model.next_id}", file=sys.stderr, flush=True)
    open(out_path, "w").write("\n".join(rows) + "\n")
    print(f"wrote {out_path} (bugs={bugs}, gating={GATING_MODE}, "
          f"ids consumed={model.next_id - 1})")


if __name__ == "__main__":
    main()
