"""DeepSORT-style Gaussian Kalman filters (XYAH / XYWH), batched.

TPU-native re-design of the reference's BaseKalmanFilter hierarchy
(reference: src/motion/kalman_filter.cpp:10-186,
src/motion/kalman_filters/xyah_kf.cpp:14-83,
include/motcpp/motion/kalman_filters/xywh_kf.hpp:17-180).

State is [pos(d), vel(d)] with F = [I, I; 0, I], H = [I, 0], diagonal
height-scaled process/measurement noise. Instead of materializing the
(2d, 2d) matrices we carry the covariance as its four (d, d) blocks
flattened into (..., 2d, 2d) and use the block identities

    F P F' = [[A+B+C+D, B+D], [C+D, D]],   proj cov = A + R

which turn predict/update into a handful of adds and one batched (d, d)
solve — ideal for vmapping over K track slots x S streams on the VPU.

The NSA confidence-scaled measurement noise R <- ((1-conf) std)^2 from the
reference's ``project`` (kalman_filter.cpp:60-75, used by StrongSORT) is
exposed via the ``nsa_conf`` argument (pass 0 to disable, matching the
reference's default-confidence path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GaussianKF:
    """Config bundle: dimension + noise-std hooks.

    The hooks mirror the reference's virtual methods
    ``get_initial_covariance_std`` / ``get_process_noise_std`` /
    ``get_measurement_noise_std`` and take the height column of the
    measurement/mean (shape (...,)) returning per-dim stds (..., d).
    """

    ndim: int
    initial_std: Callable  # h -> (..., 2d)
    process_std: Callable  # h -> (..., 2d)
    measurement_std: Callable  # h -> (..., d)

    # ---------------------------------------------------------------- init
    def initiate(self, measurement: jnp.ndarray):
        """measurement (..., d) -> mean (..., 2d), cov (..., 2d, 2d).
        Velocities start at zero (reference: kalman_filter.cpp:29-42)."""
        d = self.ndim
        mean = jnp.concatenate(
            [measurement, jnp.zeros_like(measurement)], axis=-1
        )
        std = self.initial_std(measurement[..., 3])
        cov = _diag_embed(std**2)
        assert std.shape[-1] == 2 * d
        return mean, cov

    # ------------------------------------------------------------- predict
    def predict(self, mean: jnp.ndarray, cov: jnp.ndarray):
        """x <- F x, P <- F P F' + Q (reference: kalman_filter.cpp:44-58).
        Block form avoids the generic (2d, 2d) matmuls."""
        d = self.ndim
        pos, vel = mean[..., :d], mean[..., d:]
        new_mean = jnp.concatenate([pos + vel, vel], axis=-1)

        A = cov[..., :d, :d]
        B = cov[..., :d, d:]
        C = cov[..., d:, :d]
        D = cov[..., d:, d:]
        top_left = A + B + C + D
        top_right = B + D
        bot_left = C + D
        new_cov = _blocks_to_full(top_left, top_right, bot_left, D)

        std = self.process_std(mean[..., 3])
        q = std**2
        idx = jnp.arange(2 * d)
        new_cov = new_cov.at[..., idx, idx].add(q)
        return new_mean, new_cov

    # -------------------------------------------------------------- project
    def project(self, mean: jnp.ndarray, cov: jnp.ndarray, nsa_conf=0.0):
        """Project to measurement space with NSA noise scaling
        R <- ((1-conf) * std)^2 (reference: kalman_filter.cpp:60-75)."""
        d = self.ndim
        std = self.measurement_std(mean[..., 3])
        std = std * (1.0 - jnp.asarray(nsa_conf)[..., None])
        proj_mean = mean[..., :d]
        proj_cov = cov[..., :d, :d] + _diag_embed(std**2)
        return proj_mean, proj_cov

    # --------------------------------------------------------------- update
    def update(
        self,
        mean: jnp.ndarray,
        cov: jnp.ndarray,
        measurement: jnp.ndarray,
        nsa_conf=0.0,
    ):
        """Kalman correction (reference: kalman_filter.cpp:77-112).

        K = P H' S^-1 solved as a batched (d, d) linear system; the
        reference's Cholesky-solve with pseudo-inverse fallback becomes a
        single closed-form SPD solve (XLA handles conditioning; NaN guards
        live in the tracker lifecycle like the reference's NaN pruning).
        """
        d = self.ndim
        proj_mean, S = self.project(mean, cov, nsa_conf)
        PHt = cov[..., :, :d]  # (2d, d) = P H'
        # K = PHt S^-1  ->  K' = S^-1 PHt'  (S symmetric)
        from motcpp_tpu.ops.linalg import solve_spd

        K = solve_spd(S, jnp.swapaxes(PHt, -1, -2))
        K = jnp.swapaxes(K, -1, -2)  # (..., 2d, d)
        innovation = measurement - proj_mean
        # tiny contractions as unrolled broadcast FMAs (matmul_small):
        # batched (2d, d) dot_general is the profiled TPU bottleneck shape
        from motcpp_tpu.ops.linalg import matmul_small

        new_mean = mean + jnp.sum(K * innovation[..., None, :], axis=-1)
        KS = matmul_small(K, S)
        new_cov = cov - matmul_small(KS, jnp.swapaxes(K, -1, -2))
        return new_mean, new_cov

    # ------------------------------------------------------------- gating
    def gating_distance(
        self,
        mean: jnp.ndarray,
        cov: jnp.ndarray,
        measurements: jnp.ndarray,
        only_position: bool = False,
        nsa_conf=0.0,
    ):
        """Squared Mahalanobis distance of (..., M, d) measurements to each
        projected state (reference: kalman_filter.cpp:148-176,
        xywh_kf.hpp:139-170). Returns (..., M)."""
        proj_mean, S = self.project(mean, cov, nsa_conf)
        diff = measurements - proj_mean[..., None, :]
        if only_position:
            diff = diff[..., :2]
            S = S[..., :2, :2]
        from motcpp_tpu.ops.linalg import solve_spd

        sol = solve_spd(S, jnp.swapaxes(diff, -1, -2))
        return jnp.sum(jnp.swapaxes(sol, -1, -2) * diff, axis=-1)


def _diag_embed(v: jnp.ndarray) -> jnp.ndarray:
    n = v.shape[-1]
    out = jnp.zeros(v.shape + (n,), v.dtype)
    idx = jnp.arange(n)
    return out.at[..., idx, idx].set(v)


def _blocks_to_full(tl, tr, bl, br):
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, br], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Concrete filters
# ---------------------------------------------------------------------------

_WP = 1.0 / 20.0  # std_weight_position (reference: kalman_filter.cpp:13)
_WV = 1.0 / 160.0  # std_weight_velocity (reference: kalman_filter.cpp:14)


def _xyah_initial_std(h):
    """reference: xyah_kf.cpp:14-29."""
    z = jnp.zeros_like(h)
    return jnp.stack(
        [
            2 * _WP * h,
            2 * _WP * h,
            z + 1e-2,
            2 * _WP * h,
            10 * _WV * h,
            10 * _WV * h,
            z + 1e-5,
            10 * _WV * h,
        ],
        axis=-1,
    )


def _xyah_process_std(h):
    """reference: xyah_kf.cpp:31-48."""
    z = jnp.zeros_like(h)
    return jnp.stack(
        [
            _WP * h,
            _WP * h,
            z + 1e-2,
            _WP * h,
            _WV * h,
            _WV * h,
            z + 1e-5,
            _WV * h,
        ],
        axis=-1,
    )


def _xyah_measurement_std(h):
    """reference: xyah_kf.cpp:50-62."""
    z = jnp.zeros_like(h)
    return jnp.stack([_WP * h, _WP * h, z + 1e-1, _WP * h], axis=-1)


kf_xyah = GaussianKF(
    ndim=4,
    initial_std=_xyah_initial_std,
    process_std=_xyah_process_std,
    measurement_std=_xyah_measurement_std,
)
"""ByteTrack / StrongSORT filter (reference: xyah_kf.{hpp,cpp})."""


def _xywh_initial_std(h):
    """reference: xywh_kf.hpp:48-58 — all four dims height-scaled."""
    p = 2 * _WP * h
    v = 10 * _WV * h
    return jnp.stack([p, p, p, p, v, v, v, v], axis=-1)


def _xywh_process_std(h):
    """reference: xywh_kf.hpp:77-87."""
    p = _WP * h
    v = _WV * h
    return jnp.stack([p, p, p, p, v, v, v, v], axis=-1)


def _xywh_measurement_std(h):
    """reference: xywh_kf.hpp:110-116."""
    p = _WP * h
    return jnp.stack([p, p, p, p], axis=-1)


kf_xywh = GaussianKF(
    ndim=4,
    initial_std=_xywh_initial_std,
    process_std=_xywh_process_std,
    measurement_std=_xywh_measurement_std,
)
"""BoT-SORT filter (reference: xywh_kf.hpp:17-180). Note: the reference's
XYWH update adds measurement noise from the *predicted* mean's height and
never applies NSA scaling — pass ``nsa_conf=0`` to match."""
