"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must run before jax initializes a backend. Note: the env-only route
(JAX_PLATFORMS=cpu) is NOT enough under the axon TPU plugin -- it
overrides the env var -- so we also force the config flag after import.
This mirrors how the reference tests run the engine without a live
redis-server (src/hnsw/core_tests.rs uses a mock persistence closure).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
