"""motcpp_tpu — a TPU-native multi-object tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
motcpp C++ reference library (tracking-by-detection: SORT, ByteTrack,
OC-SORT, DeepOC-SORT, StrongSORT, BoT-SORT, BoostTrack, HybridSORT,
UCMCTrack), built TPU-first:

  * All per-frame tracker updates are pure functions over fixed-capacity
    struct-of-arrays track state (masked slots instead of dynamic lists),
    so a whole video is one ``lax.scan`` and many streams batch with
    ``vmap`` / ``shard_map`` over a device mesh.
  * The hot loops of the reference (batched Kalman predict/update,
    pairwise IoU-family cost matrices, Jonker-Volgenant assignment,
    ReID CNN forward) are jit-compiled XLA/Pallas kernels.

Public API mirrors the reference's ``BaseTracker::update(dets, img, embs)
-> tracks (M, 8)`` contract (reference: include/motcpp/tracker.hpp:67).
"""

from motcpp_tpu.version import __version__, version

__all__ = [
    "__version__",
    "version",
    "create_tracker",
    "load_tracker_config",
    "TRACKERS",
]


def load_tracker_config(name: str):
    """Load ``configs/trackers/<name>.yaml`` into a typed config
    (reference: src/config.cpp:76-80 name→path mapping). Thin re-export
    of :func:`motcpp_tpu.config.load_tracker_config` for the umbrella
    namespace (reference umbrella header: include/motcpp/motcpp.hpp)."""
    from motcpp_tpu.config import load_tracker_config as _load

    return _load(name)


def create_tracker(name: str, **kwargs):
    """Construct a tracker by name, mirroring the reference eval tool's
    per-tracker construction (reference: tools/motcpp_eval.cpp:96-316).

    Args:
        name: one of ``sort``, ``bytetrack``, ``ocsort``, ``deepocsort``,
            ``strongsort``, ``botsort``, ``boosttrack``, ``hybridsort``,
            ``ucmctrack``.
        **kwargs: tracker-specific parameters (see each tracker class).
    """
    from motcpp_tpu import models

    models._load_all()
    key = name.lower().replace("-", "").replace("_", "")
    if key not in models.registry:
        raise ValueError(
            f"Unknown tracker '{name}'. Available: {sorted(models.registry)}"
        )
    return models.registry[key](**kwargs)


TRACKERS = (
    "sort",
    "bytetrack",
    "ocsort",
    "deepocsort",
    "strongsort",
    "botsort",
    "boosttrack",
    "hybridsort",
    "ucmctrack",
)
