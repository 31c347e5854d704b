"""YAML tracker configuration.

Mirrors the reference's config system (reference:
include/motcpp/config.hpp:16-49, src/config.cpp:12-80): YAML files under
``configs/trackers/<name>.yaml`` are parsed into a typed parameter map
supporting two node styles:

  * flat scalars:            ``det_thresh: 0.2``
  * hyperparameter nodes:    ``{type: uniform|choice|randint,
                               default: ..., range|choices: ...}``
    where loading takes the ``default`` and the range doubles as a
    tuning search space (src/config.cpp:24-49).
"""

from __future__ import annotations

from pathlib import Path

import yaml

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs" / "trackers"


class TrackerConfig:
    """Typed accessor map (reference: config.hpp:22-44)."""

    def __init__(self, params: dict | None = None, search_space: dict | None = None):
        self.params = params or {}
        self.search_space = search_space or {}

    def get_float(self, key: str, default: float = 0.0) -> float:
        return float(self.params.get(key, default))

    def get_int(self, key: str, default: int = 0) -> int:
        return int(self.params.get(key, default))

    def get_bool(self, key: str, default: bool = False) -> bool:
        return bool(self.params.get(key, default))

    def get_string(self, key: str, default: str = "") -> str:
        return str(self.params.get(key, default))

    def as_kwargs(self) -> dict:
        return dict(self.params)

    def sample(self, rng) -> dict:
        """Draw one parameter set from the search space (the tune-style
        nodes the YAML schema defines; reference: src/config.cpp:24-49
        parses them but upstream ships no tuner). Non-search params pass
        through unchanged.

        Node semantics:
          * ``uniform``: float in [lo, hi]
          * ``randint``: int from lo..hi (exclusive) with optional step
            (``range: [10, 61, 10]`` -> 10, 20, ..., 60)
          * ``choice``: one of the listed values
        """
        out = dict(self.params)
        for key, node in self.search_space.items():
            kind = node.get("type")
            rng_spec = node.get("range")
            if kind == "uniform":
                lo, hi = float(rng_spec[0]), float(rng_spec[1])
                out[key] = float(rng.uniform(lo, hi))
            elif kind == "randint":
                lo, hi = int(rng_spec[0]), int(rng_spec[1])
                step = int(rng_spec[2]) if len(rng_spec) > 2 else 1
                choices = list(range(lo, hi, step))
                out[key] = int(choices[rng.integers(len(choices))])
            elif kind == "choice":
                out[key] = rng_spec[int(rng.integers(len(rng_spec)))]
            else:
                raise ValueError(f"unknown search node type {kind!r} for {key}")
        return out


def get_tracker_config_path(name: str) -> Path:
    """name -> configs/trackers/<name>.yaml (src/config.cpp:76-80)."""
    return CONFIG_DIR / f"{name}.yaml"


def load_tracker_config(path_or_name) -> TrackerConfig:
    """Load a tracker YAML; accepts a path or a tracker name."""
    path = Path(path_or_name)
    if not path.exists():
        path = get_tracker_config_path(str(path_or_name))
    if not path.exists():
        raise FileNotFoundError(f"Tracker config not found: {path_or_name}")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    params: dict = {}
    search: dict = {}
    for key, node in raw.items():
        if isinstance(node, dict) and "type" in node:
            # hyperparameter-search node: take the default value
            params[key] = node.get("default")
            search[key] = {
                "type": node.get("type"),
                "range": node.get("range", node.get("choices")),
            }
        else:
            params[key] = node
    return TrackerConfig(params, search)
