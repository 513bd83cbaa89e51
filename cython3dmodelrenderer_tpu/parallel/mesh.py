"""Device mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_shapes: Sequence[Tuple[str, int]],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh([("views", 4), ("tris", 2)])``.

    ``devices`` defaults to all available devices; the product of axis sizes
    must match the device count.
    """
    if devices is None:
        devices = jax.devices()
    names = [n for n, _ in axis_shapes]
    shape = [s for _, s in axis_shapes]
    n = int(np.prod(shape))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=names)
