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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
