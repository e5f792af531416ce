"""Test configuration.

Tests run on CPU with 8 virtual devices so the sharding/mesh layer can be
exercised without TPU hardware (SURVEY.md §4: the rebuild's "fake backend").
Must set the env vars before jax initializes its backends.
"""

import os

# force CPU even if the environment pre-selects a TPU platform (TPU matmuls
# default to bf16 precision, which would break the f32 parity tolerances).
# Note: the env var alone is NOT enough here — a sitecustomize hook may call
# jax.config.update("jax_platforms", ...) at interpreter startup, so we
# override the config again after importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
