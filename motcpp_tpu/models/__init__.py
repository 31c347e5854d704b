"""Tracker registry.

Each tracker module registers its wrapper class here; ``registry`` maps
normalized names ("sort", "bytetrack", ...) to classes, mirroring the
reference's name dispatch in the eval tool
(reference: tools/motcpp_eval.cpp:96-316).
"""

registry: dict = {}


def register(name: str):
    def deco(cls):
        registry[name] = cls
        return cls

    return deco


def _load_all():
    """Import all tracker modules so the registry is fully populated."""
    import importlib

    for mod in (
        "sort",
        "bytetrack",
        "ocsort",
        "deepocsort",
        "strongsort",
        "botsort",
        "boosttrack",
        "hybridsort",
        "ucmctrack",
    ):
        try:
            importlib.import_module(f"motcpp_tpu.models.{mod}")
        except ImportError:
            pass  # module not built yet (incremental construction)
