"""Version and feature flags.

Mirrors the reference's version header (reference:
include/motcpp/version.hpp:1-24) with TPU-relevant feature flags instead
of the C++ build flags (MOTCPP_HAS_ONNX / MOTCPP_HAS_OPENCV).
"""

__version__ = "0.1.0"

VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_PATCH = 0


def version() -> str:
    return __version__


def has_tpu() -> bool:
    """True when a real TPU backend is attached."""
    import jax

    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


def has_cv2() -> bool:
    """OpenCV availability (used only by the data/visualization layer,
    never by the compute path)."""
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False
