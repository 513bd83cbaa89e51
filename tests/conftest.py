"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding paths are validated on a
host-platform device mesh (the standard JAX recipe). Must run before jax
initializes, hence the env mutation at import time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS, so
# the env var is not enough — override via jax.config before first backend use.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_OBJECTS = "/root/reference/objects"


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


@pytest.fixture
def cube_path():
    p = os.path.join(REFERENCE_OBJECTS, "cube.obj")
    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    return p


@pytest.fixture
def cube2_path():
    p = os.path.join(REFERENCE_OBJECTS, "Cube2.obj")
    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    return p


@pytest.fixture
def trex_path():
    p = os.path.join(REFERENCE_OBJECTS, "T-Rex.obj")
    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    return p


@pytest.fixture
def basketball_path():
    p = os.path.join(REFERENCE_OBJECTS, "basketball.obj")
    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    return p


# ---------------------------------------------------------------------------
# slow-test marking: the interpret-mode Pallas suites dominate the ~13 min
# full-suite wall; `pytest -m "not slow"` keeps an iteration loop under a
# minute while CI still runs everything.
SLOW_MODULES = {"test_raster_pallas", "test_multiview"}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: interpret-mode / large-scene tests (~minutes); "
        "deselect with -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
