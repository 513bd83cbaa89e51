"""A/B: live-group grid compaction (render_frame g_cap) on the hot lean
path (post="u8", packed_out=True, emit_gbuf=False) — chained frames so the
tunnel round-trip cancels. Scenes: one triangle and cube @1024² (the
sparse-floor cases) and the T-Rex headline.

Usage: python tools/probes/gcap_ab.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import _posed
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import binning, raster_pallas

NITER = 24
EPS = jnp.float32(1e-30)


def timeit(fn):
    f = jax.jit(fn)
    jax.block_until_ready(f(jnp.float32(0)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(jnp.float32(0)))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best / NITER


def chain(stage):
    def run(x0):
        x = x0
        for i in range(NITER):
            x = stage(x, jnp.int32(i + 1))
        return x
    return run


def fresh_calib():
    return timeit(chain(lambda x, i: x + i.astype(jnp.float32) * EPS))


def scene_one_triangle():
    tv = jnp.asarray([[[-0.2, -0.2, 1.0], [0.2, -0.2, 1.0],
                       [0.0, 0.2, 1.0]]], jnp.float32)
    tn = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                          (1, 3, 3))
    tc = jnp.full((1, 3, 3), 200.0, jnp.float32)
    return tv, tn, tc


def scene_cube():
    m = _posed("cube.obj", pose=False)
    tv = m.vertices_by_triangles
    tn = m.normals_by_triangles
    rng = np.random.RandomState(0)
    tc = jnp.asarray(np.repeat(rng.randint(
        256, size=(tv.shape[0], 1, 3)), 3, axis=1).astype(np.float32))
    return tv, tn, tc


def scene_trex():
    m = _posed("T-Rex.obj")
    return (m.vertices_by_triangles, m.normals_by_triangles,
            jnp.asarray(m.colors_by_triangles, jnp.float32))


def measure(tag, tv, tn, tc, size):
    config = RenderConfig(height=size, width=size, fov=45)
    from cython3dmodelrenderer_tpu.ops.projection import (
        project_to_screen, visibility_masks)

    deg, back = visibility_masks(tv, tn)
    act = jnp.logical_and(~deg, ~back)
    ts = project_to_screen(tv, config)
    total, n_act = raster_pallas.grouped_frame_demand(ts, act, config)
    p_cap = binning.capacity_bucket(max(int(total), 1) * 21 // 20, 128)
    group = raster_pallas.GROUP
    need = -(-(int(n_act) * 5 // 4) // group)
    g_cap = -(-need // 4) * 4

    def frame(g):
        def s(x, i):
            res = raster_pallas.render_frame(
                tv + x * EPS, tn, tc, config, p_cap, 0,
                group=group, post="u8", packed_out=True, emit_gbuf=False,
                g_cap=g)
            img = res[3]
            return x + img[0, 0, 0].astype(jnp.float32) * EPS
        return s

    full = timeit(chain(frame(0))) - fresh_calib()
    comp = timeit(chain(frame(g_cap))) - fresh_calib()
    print(f"{tag:26s}: full {full:6.3f}  g_cap={g_cap:3d} {comp:6.3f} "
          f"ms/frame chained (p_cap {p_cap}, active tiles {int(n_act)})",
          flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("tri", "all"):
    tv, tn, tc = scene_one_triangle()
    measure("one triangle @1024^2", tv, tn, tc, 1024)
if which in ("cube", "all"):
    tv, tn, tc = scene_cube()
    measure("cube @1024^2", tv, tn, tc, 1024)
if which in ("trex", "all"):
    tv, tn, tc = scene_trex()
    measure("T-Rex @1024^2", tv, tn, tc, 1024)
