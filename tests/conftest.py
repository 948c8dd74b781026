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


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (compile-heavy; the full "
        "suite is ~15 min on this 1-core box, the default tier ~3)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get(
        "REDIS_HNSW_TPU_TEST_SLOW"
    ):
        return
    skip = pytest.mark.skip(
        reason="slow tier: run with --slow (or "
        "REDIS_HNSW_TPU_TEST_SLOW=1)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
