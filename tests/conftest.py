"""Test configuration: force an 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by splitting the host
CPU into 8 virtual XLA devices (SURVEY.md §4: shard-count invariance of all
statistics is part of the test pyramid).  Must run before jax initialises.
"""
import os

# Hard override: the ambient environment may point JAX at the tunnelled TPU
# (JAX_PLATFORMS=axon); unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
