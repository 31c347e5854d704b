"""Motion layer: camera-motion compensation.

The Kalman filters live in ops/kalman (they are compute-path kernels);
this package holds the image-space CMC estimators that produce the
(2, 3) affine warps consumed by the tracker cores.
"""

from motcpp_tpu.motion.cmc import (
    ECC,
    ECCJax,
    SOF,
    SOFJax,
    create_cmc,
    ecc_jax_batch,
    sof_jax_batch,
)

__all__ = [
    "ECC",
    "ECCJax",
    "SOF",
    "SOFJax",
    "create_cmc",
    "ecc_jax_batch",
    "sof_jax_batch",
]
