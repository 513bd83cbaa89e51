"""Rasterizer tests: jnp batched path vs the sequential NumPy oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.models.model import Model, fit_model
from cython3dmodelrenderer_tpu.ops import raster_ref
from cython3dmodelrenderer_tpu.ops.projection import (project_to_screen,
                                                      visibility_masks)
from cython3dmodelrenderer_tpu.utils import oracle


def random_scene(t=40, seed=0):
    """Random front-facing triangles around z≈1 (the fit_model regime)."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.4, 0.4, size=(t, 1, 3)).astype(np.float32)
    centers[..., 2] = rng.uniform(0.7, 1.4, size=(t, 1)).astype(np.float32)
    offsets = rng.uniform(-0.25, 0.25, size=(t, 3, 3)).astype(np.float32)
    tris = centers + offsets
    normals = rng.randn(t, 3, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    colors = rng.uniform(0, 255, size=(t, 3, 3)).astype(np.float32)
    return tris, colors, normals


def run_batched(tris, colors, normals, config, order=None):
    tv = jnp.asarray(tris)
    tn = jnp.asarray(normals)
    tc = jnp.asarray(colors)
    if order is not None:
        tv, tn, tc = tv[order], tn[order], tc[order]
    degenerate, backfacing = visibility_masks(tv, tn)
    active = ~degenerate & ~backfacing
    ts = project_to_screen(tv, config)
    bbox = raster_ref.required_bbox_size(ts, active, config)
    return raster_ref.rasterize(ts, tc, tn, active, config,
                                bbox_size=bbox, chunk=16)


def assert_gbuffers_match(got, want, config):
    color_g, z_g, n_g = [np.asarray(x) for x in got]
    color_w, z_w, n_w = want
    # depth buffer identical (strict < + lex tie-break == sequential order)
    np.testing.assert_allclose(z_g, z_w, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(color_g, color_w, rtol=1e-4, atol=0.05)
    np.testing.assert_allclose(n_g, n_w, rtol=1e-4, atol=1e-4)


def test_single_triangle():
    config = RenderConfig(height=64, width=64, fov=90)
    tris = np.array([[[-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0]]],
                    np.float32)
    normals = np.full((1, 3, 3), [0, 0, -1], np.float32)
    colors = np.full((1, 3, 3), 200.0, np.float32)
    got = run_batched(tris, colors, normals, config)
    want = oracle.render_oracle(tris, colors, normals, config)
    assert_gbuffers_match(got, want, config)
    # the triangle actually drew something
    assert np.asarray(got[0]).max() > 0


def test_backface_culled():
    config = RenderConfig(height=32, width=32, fov=90)
    tris = np.array([[[-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0]]],
                    np.float32)
    normals = np.full((1, 3, 3), [0, 0, 1], np.float32)  # faces away
    colors = np.full((1, 3, 3), 200.0, np.float32)
    got = run_batched(tris, colors, normals, config)
    assert np.asarray(got[0]).max() == 0


def test_degenerate_culled():
    config = RenderConfig(height=32, width=32, fov=90)
    # all three xy-projected vertices collinear → 2D cross == 0
    tris = np.array([[[0.0, 0.0, 1.0], [0.1, 0.0, 1.0], [0.2, 0.0, 1.0]]],
                    np.float32)
    normals = np.full((1, 3, 3), [0, 0, -1], np.float32)
    colors = np.full((1, 3, 3), 200.0, np.float32)
    got = run_batched(tris, colors, normals, config)
    assert np.asarray(got[0]).max() == 0


def test_z_range_check():
    config = RenderConfig(height=32, width=32, fov=90, z_near=0.1, z_far=1000)
    # behind the camera → z'' < 0 → dropped
    tris = np.array([[[-0.5, -0.5, -1.0], [0.5, -0.5, -1.0], [0.0, 0.5, -1.0]]],
                    np.float32)
    normals = np.full((1, 3, 3), [0, 0, -1], np.float32)
    colors = np.full((1, 3, 3), 200.0, np.float32)
    got = run_batched(tris, colors, normals, config)
    assert np.asarray(got[0]).max() == 0


def test_depth_ordering_two_triangles():
    config = RenderConfig(height=64, width=64, fov=90)
    near = [[-0.5, -0.5, 0.8], [0.5, -0.5, 0.8], [0.0, 0.5, 0.8]]
    far = [[-0.5, -0.5, 1.5], [0.5, -0.5, 1.5], [0.0, 0.5, 1.5]]
    tris = np.array([far, near], np.float32)
    normals = np.full((2, 3, 3), [0, 0, -1], np.float32)
    colors = np.zeros((2, 3, 3), np.float32)
    colors[0] = 50.0   # far
    colors[1] = 250.0  # near
    got = run_batched(tris, colors, normals, config)
    color = np.asarray(got[0])
    # overlap region shows the near triangle
    assert abs(color[32, 32, 0] - 250.0) < 0.5
    want = oracle.render_oracle(tris, colors, normals, config)
    assert_gbuffers_match(got, want, config)


def test_random_scene_matches_oracle():
    config = RenderConfig(height=96, width=128, fov=60)
    tris, colors, normals = random_scene(t=60, seed=1)
    got = run_batched(tris, colors, normals, config)
    want = oracle.render_oracle(tris, colors, normals, config)
    assert_gbuffers_match(got, want, config)


def test_order_independence_of_depth():
    """The z-buffer resolve must not depend on triangle order."""
    config = RenderConfig(height=64, width=64, fov=60)
    tris, colors, normals = random_scene(t=30, seed=2)
    got1 = run_batched(tris, colors, normals, config)
    perm = np.random.RandomState(0).permutation(30)
    got2 = run_batched(tris[perm], colors[perm], normals[perm], config)
    np.testing.assert_allclose(np.asarray(got1[1]), np.asarray(got2[1]),
                               atol=1e-6)


def test_determinism():
    config = RenderConfig(height=64, width=64, fov=60)
    tris, colors, normals = random_scene(t=30, seed=4)
    a = run_batched(tris, colors, normals, config)
    b = run_batched(tris, colors, normals, config)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cube_end_to_end(cube_path):
    config = RenderConfig(height=128, width=128, fov=45)
    model = Model.read_model(cube_path)
    model.rotate([30, 40, 0])
    fit_model(model)
    tris = np.asarray(model.vertices_by_triangles)
    normals = np.asarray(model.normals_by_triangles)
    rng = np.random.RandomState(7)
    colors = np.repeat(rng.uniform(0, 255, (12, 1, 3)), 3, axis=1).astype(np.float32)
    got = run_batched(tris, colors, normals, config)
    want = oracle.render_oracle(tris, colors, normals, config)
    assert_gbuffers_match(got, want, config)
    assert np.asarray(got[0]).max() > 0
