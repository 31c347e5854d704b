"""SORT / OC-SORT Kalman filter in [x, y, s, r] space, batched.

TPU-native re-design of the reference's filterpy-style 7-state filter
(reference: src/motion/kalman_filters/xysr_kf.cpp:10-143, header
include/motcpp/motion/kalman_filters/xysr_kf.hpp:19-60).

State: [x, y, s, r, vx, vy, vs]  (7D; the aspect ratio r has no velocity)
Measurement: [x, y, s, r]

All arrays carry arbitrary leading batch axes (K track slots, S streams);
predict/update are pure functions ``(x, P) -> (x, P)``; the observation
history deque of the reference becomes a fixed ring buffer owned by the
tracker state (not the filter), since on TPU history is just another
(K, H, ...) tensor.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

DIM_X = 7
DIM_Z = 4


@dataclasses.dataclass(frozen=True)
class XYSRParams:
    """Noise configuration (reference: xysr_kf.cpp:49-68).

    Q_xy_scaling / Q_s_scaling are *multipliers* on the base velocity
    process noise 0.01/0.0001: SORT keeps them at 1, OC-SORT passes
    0.01/0.0001 (reference: src/trackers/ocsort.cpp:76-79, defaults at
    include/motcpp/trackers/ocsort.hpp:43).
    """

    q_xy_scaling: float = 1.0
    q_s_scaling: float = 1.0

    def Q_diag(self) -> jnp.ndarray:
        qxy = 0.01 * self.q_xy_scaling
        qs = 0.0001 * self.q_s_scaling
        return jnp.array([1.0, 1.0, 1.0, 1.0, qxy, qxy, qs], jnp.float32)

    def R_diag(self) -> jnp.ndarray:
        # R = I with scale/ratio rows x10 (reference: xysr_kf.cpp:64-65)
        return jnp.array([1.0, 1.0, 10.0, 10.0], jnp.float32)

    def P0(self) -> jnp.ndarray:
        # P = 10*I, velocity block x100 (reference: xysr_kf.cpp:52-55)
        d = jnp.array([10.0, 10.0, 10.0, 10.0, 1000.0, 1000.0, 1000.0], jnp.float32)
        return jnp.diag(d)


# F: constant velocity on (x, y, s); r static (reference: xysr_kf.cpp:25-36)
_F = jnp.eye(DIM_X, dtype=jnp.float32).at[0, 4].set(1.0).at[1, 5].set(1.0).at[2, 6].set(1.0)


def xysr_init(xysr: jnp.ndarray, params: XYSRParams | None = None):
    """New-track state: x = [measurement, 0, 0, 0], P = P0
    (reference: src/trackers/sort.cpp:30-41 initializes mean directly)."""
    params = params or XYSRParams()
    zeros = jnp.zeros(xysr.shape[:-1] + (DIM_X - DIM_Z,), xysr.dtype)
    x = jnp.concatenate([xysr, zeros], axis=-1)
    P = jnp.broadcast_to(params.P0(), xysr.shape[:-1] + (DIM_X, DIM_X))
    return x, P


def xysr_predict(x: jnp.ndarray, P: jnp.ndarray, params: XYSRParams | None = None):
    """x <- F x; P <- F P F' + Q (reference: xysr_kf.cpp:71-77).

    The F structure (pos += vel) is applied as adds, and F P F' as block
    sums, so no 7x7 matmuls are materialized.
    """
    params = params or XYSRParams()
    new_x = x.at[..., 0].add(x[..., 4]).at[..., 1].add(x[..., 5]).at[..., 2].add(x[..., 6])

    # F = I + U, U the velocity shift ((0..2) += (4..6)):
    # F P F' = P + U P + P U' + U P U' — three slice adds, no 7x7 matmul
    new_P = (
        P.at[..., :3, :].add(P[..., 4:7, :])
        .at[..., :, :3].add(P[..., :, 4:7])
        .at[..., :3, :3].add(P[..., 4:7, 4:7])
    )
    idx = jnp.arange(DIM_X)
    new_P = new_P.at[..., idx, idx].add(params.Q_diag())
    return new_x, new_P


def xysr_update(
    x: jnp.ndarray,
    P: jnp.ndarray,
    z: jnp.ndarray,
    params: XYSRParams | None = None,
):
    """Joseph-form Kalman correction (reference: xysr_kf.cpp:79-112).

    S = P[:4,:4] + R;  K = P[:, :4] S^-1;  x += K y;
    P <- (I-KH) P (I-KH)' + K R K'.
    """
    params = params or XYSRParams()
    R = params.R_diag()
    y = z - x[..., :DIM_Z]
    S = P[..., :DIM_Z, :DIM_Z] + jnp.diag(R)
    PHt = P[..., :, :DIM_Z]  # (..., 7, 4)
    from motcpp_tpu.ops.linalg import solve_spd

    K = jnp.swapaxes(solve_spd(S, jnp.swapaxes(PHt, -1, -2)), -1, -2)

    from motcpp_tpu.ops.linalg import matmul_small

    new_x = x + jnp.sum(K * y[..., None, :], axis=-1)

    # H selects the first 4 state dims, so with M = K P[:4, :]:
    # (I-KH) P (I-KH)' = P - M - M' + K P[:4, :4] K'   (P symmetric).
    # All contractions are rank-4 -> unrolled broadcast FMAs
    # (matmul_small); batched 7x7 dot_general is the profiled TPU
    # bottleneck shape.
    M = matmul_small(K, P[..., :DIM_Z, :])
    KP44Kt = matmul_small(
        matmul_small(K, P[..., :DIM_Z, :DIM_Z]), jnp.swapaxes(K, -1, -2)
    )
    KRKt = matmul_small(K * R, jnp.swapaxes(K, -1, -2))
    new_P = P - M - jnp.swapaxes(M, -1, -2) + KP44Kt + KRKt
    # enforce exact symmetry (f32 orderings drift over long scans)
    new_P = 0.5 * (new_P + jnp.swapaxes(new_P, -1, -2))
    return new_x, new_P


def xysr_apply_affine(x: jnp.ndarray, P: jnp.ndarray, m: jnp.ndarray, t: jnp.ndarray):
    """Camera-motion correction: rotate/scale position+velocity and the
    corresponding covariance blocks (reference: xysr_kf.cpp:114-141).

    m: (..., 2, 2) linear part, t: (..., 2) translation.
    """
    pos = jnp.einsum("...ij,...j->...i", m, x[..., 0:2]) + t
    vel = jnp.einsum("...ij,...j->...i", m, x[..., 4:6])
    new_x = x.at[..., 0:2].set(pos).at[..., 4:6].set(vel)

    def _rot(block):
        return jnp.einsum("...ij,...jk,...lk->...il", m, block, m)

    P = P.at[..., 0:2, 0:2].set(_rot(P[..., 0:2, 0:2]))
    P = P.at[..., 4:6, 4:6].set(_rot(P[..., 4:6, 4:6]))
    pv = _rot(P[..., 0:2, 4:6])
    P = P.at[..., 0:2, 4:6].set(pv)
    P = P.at[..., 4:6, 0:2].set(jnp.swapaxes(pv, -1, -2))
    return new_x, P
