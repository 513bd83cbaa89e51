"""Headline benchmark: T-Rex.obj @ 1024x1024, README pose, fov=45.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference's best published number —
Version C with 8 OpenMP threads at 9 ms/frame (BASELINE.md, README.md:76).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_MS = 9.0  # Version C, 8 threads (reference README.md:76)


def main():
    import jax

    from cython3dmodelrenderer_tpu import (AdvancedPixelBufferFiller,
                                           Model, fit_model)
    from cython3dmodelrenderer_tpu.config import RenderConfig

    objects = os.environ.get("CRENDER_OBJECTS", "/root/reference/objects")
    model = Model.read_model(os.path.join(objects, "T-Rex.obj"))
    model.rotate([-90, 180, 0])
    model.rotate([10, -80, 0])
    fit_model(model)

    filler = AdvancedPixelBufferFiller(1024, 1024, fov=45)
    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    tc = model.colors_by_triangles

    # warm-up / compile — two rounds: the filler re-specializes its static
    # capacity buckets after the first frame, which triggers one recompile
    for _ in range(3):
        color, z, normal = filler._rasterize(tv, tn, tc)
        jax.block_until_ready((color, z, normal))

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        color, z, normal = filler._rasterize(tv, tn, tc)
    jax.block_until_ready((color, z, normal))
    ms = (time.perf_counter() - t0) / n_iter * 1e3

    print(json.dumps({
        "metric": "T-Rex.obj 1024x1024 ms/frame (README pose, fov=45)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
