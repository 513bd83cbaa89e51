"""Mosaic-compiled Pallas rasterizer vs the XLA (jnp) oracle on real TPU.

Bounds are the measured steady-state mismatch fractions (PERF_NOTES.md):
differences come only from float rounding at triangle edges (plane-form λ in
the kernel vs ratio-form λ in the oracle), so each config's fraction is
stable across runs — a regression here means a kernel-lowering change broke
real-hardware behavior that interpret-mode tests cannot see (layouts,
``pltpu.roll``, DMA semaphores).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from cython3dmodelrenderer_tpu import Model, fit_model
from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller


def _load(path, pose, **kwargs):
    model = Model.read_model(path, **kwargs)
    if pose:
        model.rotate([-90, 180, 0])
        model.rotate([10, -80, 0])
    fit_model(model)
    return model


def _render(model, size, fov, backend):
    filler = AdvancedPixelBufferFiller(size, size, fov=fov, backend=backend)
    tc = model.colors_by_triangles
    if tc is None:
        t = model.n_triangles()
        rng = np.random.RandomState(0)
        per_tri = rng.randint(256, size=(t, 3)).astype(np.float32)
        tc = jnp.asarray(np.repeat(per_tri[:, None, :], 3, axis=1))
    filler.render_model(model, colors_override=tc)
    return (np.asarray(filler.get_color_buffer()),
            np.asarray(filler.get_z_buffer()))


def _mismatch(a, b, tol):
    return float((np.abs(a - b).max(axis=-1) > tol).mean())


# Bounds ~3-4x the measured steady-state fractions (see module docstring);
# z compares at atol 1e-3 (nearly-coplanar winner flips differ by ~1e-5 —
# rounding-class, not regressions), color at atol 0.5 (quantization unit).
CONFIGS = [
    # (name, pose, size, fov, max z-mismatch fraction, max color fraction)
    ("cube.obj", False, 256, 90, 0.0, 0.0),
    ("bunny.obj", True, 512, 45, 2e-5, 2e-5),
    ("T-Rex.obj", True, 1024, 45, 5e-5, 1.5e-4),
]


@pytest.mark.parametrize("name,pose,size,fov,zmax,cmax", CONFIGS)
def test_backend_parity(objects_dir, name, pose, size, fov, zmax, cmax):
    path = os.path.join(objects_dir, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} unavailable")
    model = _load(path, pose)
    color_p, z_p = _render(model, size, fov, "pallas")
    color_j, z_j = _render(model, size, fov, "jnp")
    zfrac = _mismatch(z_p, z_j, 1e-3)
    cfrac = _mismatch(color_p, color_j, 0.5)
    assert zfrac <= zmax, f"{name} z mismatch {zfrac} > {zmax}"
    assert cfrac <= cmax, f"{name} color mismatch {cfrac} > {cmax}"


def test_backend_parity_igor_sphere(objects_dir, assets_dir):
    path = os.path.join(assets_dir, "igor_sphere.obj")
    tex = os.path.join(objects_dir, "igor_texture.png")
    if not os.path.exists(tex):
        pytest.skip("igor texture unavailable")
    model = _load(path, True, external_texture_filename=tex)
    # fit_model normalizes RADIUS to 1 — push the round mesh back so it
    # doesn't touch the camera plane (same pose as bench.py's igor config)
    model.shift([0.0, 0.0, 1.0])
    color_p, z_p = _render(model, 512, 45, "pallas")
    color_j, z_j = _render(model, 512, 45, "jnp")
    assert _mismatch(z_p, z_j, 1e-3) <= 2e-5
    assert _mismatch(color_p, color_j, 0.5) <= 2e-5


def test_determinism_on_device(objects_dir):
    """Bit-identical output across repeated renders on real hardware —
    the race the reference ships (z-test outside the lock) is designed out."""
    path = os.path.join(objects_dir, "T-Rex.obj")
    if not os.path.exists(path):
        pytest.skip("T-Rex unavailable")
    model = _load(path, True)
    c1, z1 = _render(model, 512, 45, "pallas")
    c2, z2 = _render(model, 512, 45, "pallas")
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(z1, z2)


def test_shard_map_pallas_compiles_on_device(objects_dir):
    """The REAL Mosaic kernel under ``shard_map`` on the TPU.

    All CPU-suite sharded coverage runs the Pallas kernels in interpreter
    mode, and interpret mode provably hides Mosaic breaks (a DMA-alignment
    bug shipped that way once). A 1-device mesh compiles and executes the
    actual ``shard_map(pallas_call)`` composition today, no multi-chip
    hardware needed; the result must be bit-identical to the unsharded
    production sweep. (Reference analogue: its parallel path IS the
    production path, advanced_pixel_buffer_filler.pyx:177-242.)"""
    import jax
    from jax.sharding import Mesh

    from cython3dmodelrenderer_tpu.config import RenderConfig
    from cython3dmodelrenderer_tpu.parallel import multiview

    path = os.path.join(objects_dir, "T-Rex.obj")
    if not os.path.exists(path):
        pytest.skip("T-Rex unavailable")
    model = _load(path, True)
    model.shift([0.0, 0.0, -1.0])     # recenter: the sweep re-applies z+1
    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
    config = RenderConfig(height=512, width=512, fov=45)
    angles = multiview.turntable_angles(4)
    p_cap = multiview.turntable_capacity(tv, tn, config, n_samples=4)

    want = np.asarray(multiview.render_turntable_pallas(
        tv, tn, tc, angles, config, p_cap=p_cap))

    mesh = Mesh(np.array(jax.devices()[:1]), ("views",))
    got = np.asarray(multiview.render_turntable_sharded(
        tv, tn, tc, angles, config, mesh, backend="pallas", p_cap=p_cap,
        interpret=False))
    np.testing.assert_array_equal(got, want)


def test_view_batched_sweep_on_device(objects_dir):
    """view_batch=2 through the REAL Mosaic kernel: the stacked tile grid
    (view-relative plane eval + stacked y-bbox) must render every view
    bit-identically to the per-view sweep on hardware, not just in the
    interpreter (interpret mode provably hides Mosaic breaks)."""
    from cython3dmodelrenderer_tpu.config import RenderConfig
    from cython3dmodelrenderer_tpu.parallel import multiview

    path = os.path.join(objects_dir, "T-Rex.obj")
    if not os.path.exists(path):
        pytest.skip("T-Rex unavailable")
    model = _load(path, True)
    model.shift([0.0, 0.0, -1.0])     # recenter: the sweep re-applies z+1
    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
    config = RenderConfig(height=512, width=512, fov=45)
    angles = multiview.turntable_angles(4)

    p1 = multiview.sequence_capacity(tv, tn, angles, None, config)
    want = np.asarray(multiview.render_turntable_pallas(
        tv, tn, tc, angles, config, p_cap=p1))
    p2 = multiview.sequence_capacity(tv, tn, angles, None, config,
                                     view_batch=2)
    got, used = multiview.render_turntable_pallas(
        tv, tn, tc, angles, config, p_cap=p2, view_batch=2,
        check_capacity=True)
    assert int(used) <= p2
    np.testing.assert_array_equal(np.asarray(got), want)


def test_triangle_sharded_pallas_compiles_on_device(objects_dir):
    """Triangle-sharded mode (z-argmin merge collectives) with the real
    Mosaic kernel on a 1-device mesh — same rationale as the view-sharded
    test above; the collective ring degenerates but the composition
    (shard_map + pallas_call + pmin/psum) still compiles and must agree
    with the unsharded frame bit-for-bit."""
    import jax
    from jax.sharding import Mesh

    from cython3dmodelrenderer_tpu.config import RenderConfig
    from cython3dmodelrenderer_tpu.parallel import multiview

    path = os.path.join(objects_dir, "cube.obj")
    if not os.path.exists(path):
        pytest.skip("cube unavailable")
    model = _load(path, False)
    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    t = model.n_triangles()
    rng = np.random.RandomState(0)
    per_tri = rng.randint(256, size=(t, 3)).astype(np.float32)
    tc = jnp.asarray(np.repeat(per_tri[:, None, :], 3, axis=1))
    config = RenderConfig(height=256, width=256, fov=90)

    mesh = Mesh(np.array(jax.devices()[:1]), ("tris",))
    color_s, z_s, _n = multiview.render_triangle_sharded(
        tv, tn, tc, config, mesh, backend="pallas", interpret=False)

    filler = AdvancedPixelBufferFiller(256, 256, fov=90, backend="pallas")
    filler.render_model(model, colors_override=tc)
    # the sharded path shades; compare the z-buffer (shading-independent)
    np.testing.assert_array_equal(
        np.asarray(z_s), np.asarray(filler.get_z_buffer()))


def test_ungrouped_fallback_parity_on_device(objects_dir):
    """The un-grouped (group=1) path on real hardware — it is the degrade
    target when a workload exceeds the packed grouped binner's bit budgets
    (binsort_pallas.grouped_limits_ok), so it needs Mosaic-compiled
    coverage too, not just interpret mode."""
    path = os.path.join(objects_dir, "cube.obj")
    if not os.path.exists(path):
        pytest.skip("cube unavailable")
    model = _load(path, False)

    def render_with_group(group):
        filler = AdvancedPixelBufferFiller(256, 256, fov=90,
                                           backend="pallas")
        filler._group = group
        t = model.n_triangles()
        rng = np.random.RandomState(0)
        per_tri = rng.randint(256, size=(t, 3)).astype(np.float32)
        tc = jnp.asarray(np.repeat(per_tri[:, None, :], 3, axis=1))
        filler.render_model(model, colors_override=tc)
        return (np.asarray(filler.get_color_buffer()),
                np.asarray(filler.get_z_buffer()))

    c1, z1 = render_with_group(1)
    c4, z4 = render_with_group(4)
    np.testing.assert_array_equal(z1, z4)
    np.testing.assert_array_equal(c1, c4)


def test_oversized_capacity_degrade_on_device(objects_dir):
    """A capacity past the packed grouped binner's 2^17-slot budget must
    still COMPILE and render on real hardware: it degrades to the
    un-grouped path, which in turn must route around the SMEM placement
    kernel (whose (p_cap//128, 128) order buffer overflows the ~1 MB SMEM —
    a measured compile failure at 458k slots) to the pure-XLA
    ``binning.bin_pairs``. Output must match the normal grouped render
    bit-for-bit (capacity padding never changes pixels)."""
    from cython3dmodelrenderer_tpu.config import RenderConfig
    from cython3dmodelrenderer_tpu.ops import raster_pallas

    path = os.path.join(objects_dir, "cube.obj")
    if not os.path.exists(path):
        pytest.skip("cube unavailable")
    model = _load(path, False)
    t = model.n_triangles()
    rng = np.random.RandomState(0)
    per_tri = rng.randint(256, size=(t, 3)).astype(np.float32)
    tc = jnp.asarray(np.repeat(per_tri[:, None, :], 3, axis=1))
    config = RenderConfig(height=256, width=256, fov=90)

    def render(p_cap):
        (color, z, _n), _used, _act = raster_pallas.render_frame(
            model.vertices_by_triangles, model.normals_by_triangles, tc,
            config, p_cap=p_cap, grid_cap=0, group=raster_pallas.GROUP)
        return np.asarray(color), np.asarray(z)

    want_c, want_z = render(4096)          # normal grouped path
    big_cap = (1 << 18)   # past SMEM_PLACEMENT_SLOT_LIMIT and 2^17 slots
    got_c, got_z = render(big_cap)
    np.testing.assert_array_equal(got_z, want_z)
    np.testing.assert_array_equal(got_c, want_c)


def test_sign_cover_on_device(objects_dir):
    """Opt-in sign-bit coverage fold through Mosaic on real hardware:
    ``lax.bitcast_convert_type`` + integer OR must compile in the grouped
    kernel, and the result may differ from the exact default only at
    exactly-on-edge (-0.0 λ) pixels — a tiny mismatch fraction."""
    path = os.path.join(objects_dir, "T-Rex.obj")
    if not os.path.exists(path):
        pytest.skip("T-Rex unavailable")
    model = _load(path, True)

    def render(sign_cover):
        filler = AdvancedPixelBufferFiller(512, 512, fov=45,
                                           backend="pallas",
                                           sign_cover=sign_cover)
        filler.render_model(model)
        return (np.asarray(filler.get_color_buffer()),
                np.asarray(filler.get_z_buffer()))

    c_exact, z_exact = render(False)
    c_fold, z_fold = render(True)
    lit = (z_exact[..., 0] < 1e6)
    assert lit.sum() > 1000, "empty render — the parity check proved nothing"
    assert _mismatch(z_fold, z_exact, 1e-3) <= 1e-4
    assert _mismatch(c_fold, c_exact, 0.5) <= 1e-4


def test_fast_shade_on_device(objects_dir):
    """Fast-shade (Gouraud, 3 attr channels) on real hardware: the depth
    buffer must stay BIT-IDENTICAL to the exact 6-channel mode (same
    geometry planes drive the z-argmin), and the shaded image must stay
    close — it differs only by interpolate-then-shade vs
    shade-then-interpolate order (fillers.py fast_shade docs)."""
    path = os.path.join(objects_dir, "cube.obj")
    if not os.path.exists(path):
        pytest.skip("cube unavailable")
    model = _load(path, False)
    t = model.n_triangles()
    rng = np.random.RandomState(0)
    per_tri = rng.randint(256, size=(t, 3)).astype(np.float32)
    tc = jnp.asarray(np.repeat(per_tri[:, None, :], 3, axis=1))
    light = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    def render(fast):
        filler = AdvancedPixelBufferFiller(256, 256, fov=90,
                                           backend="pallas",
                                           fast_shade=fast)
        filler.render_model(model, colors_override=tc,
                            post="lambert_u8", light=light)
        return (np.asarray(filler.get_post_image()),
                np.asarray(filler.get_z_buffer()))

    img_exact, z_exact = render(False)
    img_fast, z_fast = render(True)
    np.testing.assert_array_equal(z_exact, z_fast)
    lit = (z_exact[..., 0] < 1e6)
    assert lit.sum() > 1000, "empty render — the parity check proved nothing"
    diff = np.abs(img_exact.astype(np.int32) - img_fast.astype(np.int32))
    assert diff[lit].mean() < 8.0, f"fast-shade image drifted: {diff[lit].mean()}"


def test_lean_u8_frame_on_device(objects_dir):
    """The LEAN hot frame (post="u8", no G-buffer output, n_attrs=3) must
    produce the same uint8 image on real hardware as a keep_gbuffers=True
    dispatch of the same inputs (full 6-channel kernel variant), and its
    deferred getters must serve the full-channel G-buffers."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.fillers import (_DEFERRED,
                                                   AdvancedPixelBufferFiller)

    path = os.path.join(objects_dir, "T-Rex.obj")
    if not os.path.exists(path):
        pytest.skip("T-Rex unavailable")
    model = _load(path, True)
    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    tc = jnp.asarray(model.colors_by_triangles, jnp.float32)

    hot = AdvancedPixelBufferFiller(512, 512, fov=45, backend="pallas")
    hot.render_arrays(tv, tn, tc, post="u8")
    assert hot._packed is _DEFERRED
    img_hot = np.asarray(hot._post_image)

    eager = AdvancedPixelBufferFiller(512, 512, fov=45, backend="pallas")
    eager.render_arrays(tv, tn, tc, post="u8", keep_gbuffers=True)
    np.testing.assert_array_equal(img_hot, np.asarray(eager._post_image))
    np.testing.assert_array_equal(np.asarray(hot.get_z_buffer()),
                                  np.asarray(eager.get_z_buffer()))
    np.testing.assert_array_equal(np.asarray(hot.get_normals_buffer()),
                                  np.asarray(eager.get_normals_buffer()))
