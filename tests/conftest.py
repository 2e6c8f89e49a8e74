"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must set flags before JAX initializes (SURVEY.md §4.4 distributed-test
strategy: simulate the mesh with xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config
# before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
