"""Test configuration.

Tests run on CPU with 8 virtual devices so the sharding/mesh layer can be
exercised without TPU hardware (SURVEY.md §4: the rebuild's "fake backend").
Must set the env vars before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
