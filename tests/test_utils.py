"""Coverage for utils (timing, oracle helpers) and parallel.mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.parallel.mesh import make_mesh
from cython3dmodelrenderer_tpu.utils import oracle, timing


def test_time_frames():
    f = jax.jit(lambda: jnp.ones((8, 8)) * 2)
    ms = timing.time_frames(lambda: f(), n_warm=1, n_iter=3)
    assert ms > 0


def test_frame_stats():
    stats = timing.FrameStats(ms_per_frame=2.0, frames=10, triangles=10000,
                              pairs=12000, active_tiles=64)
    assert stats.mtris_per_sec == pytest.approx(5.0)


def test_profile_trace(tmp_path):
    with timing.profile_trace(str(tmp_path / "trace")) as d:
        x = jax.jit(lambda: jnp.zeros((4, 4)) + 1)()
        jax.block_until_ready(x)
    import glob

    assert glob.glob(str(tmp_path / "trace") + "/**/*.pb", recursive=True)


def test_make_mesh():
    n = len(jax.devices())
    mesh = make_mesh([("views", n)])
    assert mesh.shape["views"] == n
    if n >= 4 and n % 2 == 0:
        mesh2 = make_mesh([("a", n // 2), ("b", 2)])
        assert mesh2.shape["a"] == n // 2 and mesh2.shape["b"] == 2
    with pytest.raises(AssertionError):
        make_mesh([("views", n + 1)])


def test_oracle_projection_matches_jnp():
    from cython3dmodelrenderer_tpu.ops.projection import (project_to_screen,
                                                          projection_matrix)

    config = RenderConfig(height=96, width=128, fov=55, z_near=0.2, z_far=50)
    np.testing.assert_allclose(np.asarray(projection_matrix(config)),
                               oracle.projection_matrix_np(config), rtol=1e-6)
    rng = np.random.RandomState(0)
    tris = rng.uniform(-1, 1, (5, 3, 3)).astype(np.float32)
    tris[..., 2] += 2.0
    got = np.asarray(project_to_screen(jnp.asarray(tris), config))
    want = np.stack([oracle.project_np(t.copy(), config) for t in tris])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
