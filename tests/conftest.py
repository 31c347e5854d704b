"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by splitting the
host CPU into 8 XLA devices (the reference has no distributed layer to
mirror — see SURVEY.md §2.8; this is our stream-parallel test rig).
Must run before jax initializes, hence module-level in conftest.
"""

import os

# The environment's sitecustomize registers the axon TPU-tunnel PJRT
# plugin and pins jax_platforms="axon,cpu" through the *config API*, so
# neither JAX_PLATFORMS=cpu nor os.environ assignment wins. Tests must
# run on the virtual 8-device CPU mesh: set XLA_FLAGS before the jax
# import, then override the config after it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall clock is dominated by
# XLA compiles of the same (tracker, shape) programs every run; cached
# compiles turn repeat runs into the "fast tier" (docs/benchmarking.md
# §Test tiers). Entries are keyed on HLO + config so source changes
# that alter a program recompile automatically; sweep zero-byte /
# .tmp leftovers from interrupted runs (they wedge lookups).
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/motcpp_jax_cache_tests"
)
try:
    from pathlib import Path as _Path

    for _p in _Path(_cache_dir).glob("*"):
        try:
            if _p.suffix == ".tmp" or _p.stat().st_size == 0:
                _p.unlink(missing_ok=True)
        except OSError:
            pass
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # CPU-backend caching is off by default; tests run on CPU
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass  # older jax without the persistent cache knobs

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_collection_modifyitems(config, items):
    """Apply the curated `fast` marker (tests/fast_tier.py).

    The fast tier is an explicit node-id-prefix list so `-m fast` is a
    reviewable, stable subset (<5 min cold) rather than an emergent
    property of timing; see docs/benchmarking.md §Test tiers.
    """
    from fast_tier import FAST_TIER

    for item in items:
        # nodeids are rootdir-relative ("tests/test_x.py::test_y")
        if any(item.nodeid.startswith(p) for p in FAST_TIER):
            item.add_marker(pytest.mark.fast)
