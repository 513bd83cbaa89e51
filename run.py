"""Demo driver — mirrors the reference's ``run.py`` T-Rex render.

Loads T-Rex, applies the README pose (``rotate([-90,180,0])`` →
``rotate([10,-80,0])`` → fit to unit span at z=1), renders 1024x1024 at
fov=45 with Lambert illumination, writes ``output/T-Rex.png``
(reference ``run.py:11-43``).
"""
import os
import time

import numpy as np

from cython3dmodelrenderer_tpu import (AdvancedPixelBufferFiller,
                                       GuroIllumination, Model, Renderer,
                                       SimpleIterator, fit_model)

OBJECTS_DIR = os.environ.get("CRENDER_OBJECTS",
                             "/root/reference/objects")


def tpu_renderer(model, out_path="output/T-Rex.png", size=1024):
    filler = AdvancedPixelBufferFiller(size, size, fov=45)
    illumination = GuroIllumination([0, 0, 1])
    renderer = Renderer(filler, illumination, SimpleIterator,
                        *filler.get_size())
    image = renderer.render(model)

    # warm frames: the filler re-specializes its capacity buckets after the
    # first frame (one extra compile), so warm past that before timing
    import jax

    for _ in range(2):
        image = renderer.render(model)
    jax.block_until_ready(image.array)

    # wide window: each timing window carries ~30 ms of fixed tunnel
    # round-trip latency; steady-state frame rate is the metric
    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        image = renderer.render(model)
    jax.block_until_ready(image.array)
    dt = (time.perf_counter() - t0) / n
    print(f"frame time (compiled, amortized over {n}): {dt * 1e3:.2f} ms")

    # strict capacity validation (one sync) before the frame leaves the device
    filler.validate_capacity()
    image = renderer.render(model)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    image.write_to_file(out_path)
    print(f"wrote {out_path}")
    return image


if __name__ == "__main__":
    model = Model.read_model(os.path.join(OBJECTS_DIR, "T-Rex.obj"))
    model.rotate([-90, 180, 0])
    model.rotate([10, -80, 0])
    fit_model(model)
    tpu_renderer(model)
