"""Test configuration: force an 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by splitting the host
CPU into 8 virtual XLA devices (SURVEY.md §4: shard-count invariance of all
statistics is part of the test pyramid).  Must run before jax initialises.
"""
import os

# Hard override: the ambient sitecustomize (axon TPU tunnel) forces
# jax.config.jax_platforms = "axon,cpu" at interpreter start, which wins over
# the JAX_PLATFORMS env var — unit tests must run on the virtual CPU mesh, so
# override the *config* after import, before any backend is initialised.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
