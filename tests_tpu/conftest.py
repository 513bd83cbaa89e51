"""On-device parity regression harness (real TPU required).

Unlike ``tests/`` (which forces a virtual CPU mesh), this suite runs on
whatever device jax picks — and skips itself entirely off-TPU. It promotes
the ad hoc Mosaic-vs-XLA spot checks from PERF_NOTES.md into a repeatable
command:

    python -m pytest tests_tpu/ -q

Each Pallas kernel compile goes over the remote-compile tunnel (~10-60 s
cold), so this is an explicit verification step, not part of the default
CI-style ``tests/`` run.
"""
import os

import jax
import pytest

REFERENCE_OBJECTS = os.environ.get("CRENDER_OBJECTS",
                                   "/root/reference/objects")
ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "assets")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="real TPU required (tests_tpu/)")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def objects_dir():
    if not os.path.isdir(REFERENCE_OBJECTS):
        pytest.skip("reference assets unavailable")
    return REFERENCE_OBJECTS


@pytest.fixture
def assets_dir():
    return ASSETS
