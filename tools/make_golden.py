"""Generate the repo's SELF-CONTAINED golden render (assets/golden_sphere.png).

The reference's committed golden (``/root/reference/output/T-Rex.png``) needs
the reference mount; this one is reproducible from committed inputs alone:
the committed ``assets/igor_sphere.obj`` mesh, deterministic seeded
per-triangle colors, Lambert light [0, 0, 1], 512², fov=45, the README-style
pose — rendered by the pure-XLA oracle backend (``backend="jnp"``, the
py-filler-semantics rasterizer) on CPU.

``tests/test_renderer.py::test_golden_standalone`` re-renders the same scene
through the production Pallas path and compares. Regenerate (only after an
intentional semantics change) with:  python tools/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "assets", "golden_sphere.png")


def build_scene():
    """The golden scene (shared with the test — import it from here)."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu import Model, fit_model

    model = Model.read_model(os.path.join(REPO, "assets", "igor_sphere.obj"),
                             external_texture_filename=None)
    model.rotate([-90, 180, 0])
    model.rotate([10, -80, 0])
    fit_model(model)
    model.shift([0.0, 0.0, 1.0])   # sphere radius 1: push off the camera
    rng = np.random.RandomState(0)
    per_tri = rng.randint(256, size=(model.n_triangles(), 3))
    colors = jnp.asarray(np.repeat(per_tri[:, None, :], 3, axis=1)
                         .astype(np.float32))
    return model, colors


def render(backend: str, interpret: bool = False) -> np.ndarray:
    from cython3dmodelrenderer_tpu import (AdvancedPixelBufferFiller,
                                           GuroIllumination)

    model, colors = build_scene()
    filler = AdvancedPixelBufferFiller(512, 512, fov=45, backend=backend,
                                       interpret=interpret)
    shader = GuroIllumination([0, 0, 1])
    filler.render_model(model, colors_override=colors, post="lambert_u8",
                        light=shader.light_direction)
    filler.validate_capacity()
    return np.asarray(filler.get_post_image())


if __name__ == "__main__":
    img = render("jnp")
    cv2.imwrite(OUT, img[::-1])   # same row flip as Buffer.write_to_file
    print(f"wrote {OUT} ({img.shape}, nonzero {float((img > 0).mean()):.3f})")
