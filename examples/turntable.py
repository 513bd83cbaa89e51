"""64-camera turntable of T-Rex on one TPU chip (BASELINE config 5).

Renders all views through the Pallas rasterizer in a single jitted sweep and
writes every 8th view as a PNG.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax
import jax.numpy as jnp

from cython3dmodelrenderer_tpu import Model
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.parallel import multiview

OBJECTS = os.environ.get("CRENDER_OBJECTS", "/root/reference/objects")
OUT = os.path.join(os.path.dirname(__file__), "..", "output")


def main(n_views: int = 64, size: int = 1024, view_batch: int = 1):
    model = Model.read_model(os.path.join(OBJECTS, "T-Rex.obj"))
    model.rotate([-90, 180, 0])
    model.shift(-model.get_mean_vertex())
    model.scale(1.0 / model.get_max_span())
    # keep the model centered: the turntable applies the z shift per view

    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
    config = RenderConfig(height=size, width=size, fov=45)

    # view_batch=V stacks V views into one kernel launch (bit-identical
    # frames); size the capacity with the same V
    p_cap = multiview.turntable_capacity(tv, tn, config,
                                         view_batch=view_batch)
    angles = multiview.turntable_angles(n_views)

    def sweep():
        return multiview.render_turntable_pallas(tv, tn, tc, angles, config,
                                                 p_cap=p_cap,
                                                 view_batch=view_batch)

    frames = sweep()
    jax.block_until_ready(frames)

    t0 = time.perf_counter()
    frames = sweep()
    jax.block_until_ready(frames)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{n_views} views x {size}x{size}: {dt:.1f} ms "
          f"({dt / n_views:.2f} ms/view)")

    import cv2
    import numpy as np

    os.makedirs(OUT, exist_ok=True)
    host = np.asarray(frames[::8])
    for k, frame in enumerate(host):
        cv2.imwrite(os.path.join(OUT, f"turntable_{8 * k:02d}.png"),
                    frame[::-1].astype("uint8"))
    print(f"wrote {len(host)} frames to {OUT}/turntable_*.png")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=64)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--view-batch", type=int, default=1)
    a = ap.parse_args()
    main(a.views, a.size, a.view_batch)
