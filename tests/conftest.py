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

REFERENCE_OBJECTS = os.environ.get("CRENDER_OBJECTS",
                                   "/root/reference/objects")
# committed fallbacks: the repo stands alone when the reference mount is
# absent — tiny meshes are vendored in assets/, bigger reference-only
# meshes (T-Rex, bunny, basketball) skip their tests
VENDORED_ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def _asset(name, vendored=True):
    p = os.path.join(REFERENCE_OBJECTS, name)
    if os.path.exists(p):
        return p
    if vendored:
        p = os.path.join(VENDORED_ASSETS, name)
        if os.path.exists(p):
            return p
    pytest.skip(f"{name} unavailable (no reference mount, not vendored)")


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


@pytest.fixture
def cube_path():
    return _asset("cube.obj")


@pytest.fixture
def cube2_path():
    return _asset("Cube2.obj")


@pytest.fixture
def trex_path():
    return _asset("T-Rex.obj", vendored=False)


@pytest.fixture
def basketball_path():
    return _asset("basketball.obj", vendored=False)


@pytest.fixture
def igor_sphere_path():
    return _asset("igor_sphere.obj")


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
