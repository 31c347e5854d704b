"""Numerics kernel layer: box ops, IoU-family costs, assignment, Kalman.

These are the TPU equivalents of the reference's hot C++/Eigen loops
(reference: include/motcpp/utils/{ops,iou,matching}.hpp,
include/motcpp/association/lap_solver.hpp, src/motion/). Everything here
is shape-static, mask-aware, jit/vmap-compatible pure functions.
"""

from motcpp_tpu.ops import boxes, iou, lap, matching
from motcpp_tpu.ops.lap import solve_lap_masked
from motcpp_tpu.ops.matching import linear_assignment_masked

__all__ = [
    "boxes",
    "iou",
    "lap",
    "matching",
    "solve_lap_masked",
    "linear_assignment_masked",
]
