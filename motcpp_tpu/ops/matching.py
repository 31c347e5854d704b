"""Cost fusion, embedding distances and the assignment wrapper.

TPU-native equivalent of the reference's matching layer (reference:
include/motcpp/utils/matching.hpp, src/utils/matching.cpp). All functions
are mask-aware (N, M) array ops; ``linear_assignment_masked`` wraps the
jit LAP kernel and returns index maps + masks instead of dynamic lists.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from motcpp_tpu.ops.iou import iou_batch
from motcpp_tpu.ops.lap import solve_lap_masked

# Chi-square 0.95 quantiles, 1..9 dof (reference: utils/matching.hpp:16-26)
CHI2INV95 = (
    3.8415,
    5.9915,
    7.8147,
    9.4877,
    11.070,
    12.592,
    14.067,
    15.507,
    16.919,
)


def iou_distance(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """1 - IoU (reference: src/utils/matching.cpp:62-65)."""
    return 1.0 - iou_batch(a_xyxy, b_xyxy)


def embedding_distance(
    track_feats: jnp.ndarray, det_feats: jnp.ndarray, metric: str = "cosine"
) -> jnp.ndarray:
    """Pairwise embedding distance (reference: src/utils/matching.cpp:67-107).

    cosine: max(0, 1 - cos_sim) with the reference's +1e-10 denominator
    guard; euclidean: plain L2. On TPU the (N, D) x (D, M) contraction
    rides the MXU.
    """
    if metric == "cosine":
        tn = jnp.linalg.norm(track_feats, axis=-1, keepdims=True)
        dn = jnp.linalg.norm(det_feats, axis=-1, keepdims=True)
        sim = (track_feats @ det_feats.T) / (tn * dn.T + 1e-10)
        return jnp.maximum(0.0, 1.0 - sim)
    if metric == "euclidean":
        d2 = (
            jnp.sum(track_feats**2, -1)[:, None]
            - 2.0 * track_feats @ det_feats.T
            + jnp.sum(det_feats**2, -1)[None, :]
        )
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    raise ValueError(f"Unknown metric: {metric}")


def fuse_score(iou_cost: jnp.ndarray, det_confs: jnp.ndarray) -> jnp.ndarray:
    """1 - (1 - iou_cost) * conf  (reference: src/utils/matching.cpp:130-143,
    used by ByteTrack / BoT-SORT first-stage association)."""
    return 1.0 - (1.0 - iou_cost) * det_confs[None, :]


def fuse_iou(
    reid_cost: jnp.ndarray,
    tracks_xyxy: jnp.ndarray,
    dets_xyxy: jnp.ndarray,
) -> jnp.ndarray:
    """reid_sim * (1 + iou_sim) / 2 -> cost (reference:
    src/utils/matching.cpp:109-128)."""
    reid_sim = 1.0 - reid_cost
    iou_sim = iou_batch(tracks_xyxy, dets_xyxy)
    return 1.0 - reid_sim * (1.0 + iou_sim) / 2.0


def fuse_motion(
    cost: jnp.ndarray,
    gating_dist: jnp.ndarray,
    only_position: bool = False,
    lam: float = 0.98,
) -> jnp.ndarray:
    """Mahalanobis gating + lambda blend (reference:
    utils/matching.hpp:61-94). ``gating_dist`` is the precomputed (N, M)
    squared Mahalanobis matrix from the batched KF; entries above
    chi2inv95[dof] are gated to +inf, the rest blended
    ``lam * cost + (1 - lam) * maha``.
    """
    gating_dim = 2 if only_position else 4
    gate = CHI2INV95[gating_dim - 1]
    blended = lam * cost + (1.0 - lam) * gating_dist
    return jnp.where(gating_dist > gate, jnp.inf, blended)


def linear_assignment_masked(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    thresh,
):
    """Masked assignment with cost-limit semantics (reference:
    src/utils/matching.cpp:14-60 wrapping LAPSolver::linearAssignment).

    Returns ``(row2col, col2row)`` int32 maps with -1 for unmatched;
    equivalently ``matches = row2col >= 0`` on the row side.
    """
    return solve_lap_masked(cost, row_mask, col_mask, thresh)


def linear_assignment(cost: np.ndarray, thresh: float):
    """Host-convenience wrapper mirroring the reference's return shape:
    ``(matches [(i, j)], unmatched_a, unmatched_b)``. Use
    :func:`linear_assignment_masked` inside jitted tracker cores.
    """
    cost = np.asarray(cost, np.float32)
    n, m = cost.shape
    if n == 0 or m == 0:
        return [], list(range(n)), list(range(m))
    r2c, c2r = solve_lap_masked(
        jnp.asarray(cost),
        jnp.ones((n,), bool),
        jnp.ones((m,), bool),
        thresh,
    )
    r2c = np.asarray(r2c)
    c2r = np.asarray(c2r)
    matches = [(i, int(r2c[i])) for i in range(n) if r2c[i] >= 0]
    unmatched_a = [i for i in range(n) if r2c[i] < 0]
    unmatched_b = [j for j in range(m) if c2r[j] < 0]
    return matches, unmatched_a, unmatched_b
