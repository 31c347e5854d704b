"""Batched Kalman filters over fixed-capacity track slots.

TPU-native equivalents of the reference's per-track Eigen filters
(reference: src/motion/kalman_filter.cpp, src/motion/kalman_filters/).
Each filter operates on all K slots of all S streams at once: means are
``(..., K, 2d)`` and covariances ``(..., K, 2d, 2d)``; the constant-
velocity structure F = [I I; 0 I], H = [I 0] is exploited as block
arithmetic so predict/update lower to a few fused VPU ops instead of
generic tiny matmuls.
"""

from motcpp_tpu.ops.kalman.gaussian import (
    GaussianKF,
    kf_xyah,
    kf_xywh,
)
from motcpp_tpu.ops.kalman.xysr import XYSRParams, xysr_init, xysr_predict, xysr_update

__all__ = [
    "GaussianKF",
    "kf_xyah",
    "kf_xywh",
    "XYSRParams",
    "xysr_init",
    "xysr_predict",
    "xysr_update",
]
