"""Fixed-frame-cost floor probe (VERDICT r3 task 2).

Measures near-empty frames on the production pipeline — an empty scene,
one triangle, and the 12-triangle cube at 256² and 1024² — to bound the
per-frame FIXED cost (binning's fixed stages, bitonic sort minimum, grid
launch, glue) that no amount of chunk-loop optimization can remove. If
this floor is a large fraction of the <1 ms north-star budget, the
target needs restructuring (fusing fixed stages), not faster inner loops.

Timing is stage_chain3-style: NITER dependent iterations inside one jit
(runtime-carry perturbation defeats CSE), so the tunnel's per-dispatch
round-trip cancels. A bench.py-style steady-state wall is printed too.

Usage: python tools/probes/floor.py
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

NITER = 64
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
    # re-measured right before each stage: the tunnel round-trip drifts by
    # tens of ms between runs, and calib is that round-trip / NITER
    return timeit(chain(lambda x, i: x + i.astype(jnp.float32) * EPS))


calib = fresh_calib()
print(f"calibration {calib:7.3f} ms", flush=True)


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


def measure(tag, tv, tn, tc, size):
    config = RenderConfig(height=size, width=size, fov=45)
    if tv.shape[0]:
        from cython3dmodelrenderer_tpu.ops.projection import (
            project_to_screen, visibility_masks)

        deg, back = visibility_masks(tv, tn)
        ts = project_to_screen(tv, config)
        total = raster_pallas.grouped_slot_total(
            ts, jnp.logical_and(~deg, ~back), config)
        p_cap = binning.capacity_bucket(max(int(total), 1) * 5 // 4, 128)
    else:
        p_cap = 4096

    def frame(x, i):
        res = raster_pallas.render_frame(
            tv + x * EPS, tn, tc, config, p_cap, 0,
            group=raster_pallas.GROUP, post="u8")
        img = res[3]
        return x + img[0, 0, 0].astype(jnp.float32) * EPS

    ms = timeit(chain(frame)) - fresh_calib()
    print(f"{tag:30s}: {ms:7.3f} ms/frame chained (p_cap {p_cap})",
          flush=True)
    return ms


print("== chained full-frame floor (per-dispatch tunnel cost cancelled) ==")
tv1, tn1, tc1 = scene_one_triangle()
measure("one triangle @1024^2", tv1, tn1, tc1, 1024)
tvc, tnc, tcc = scene_cube()
measure("cube (12 tris) @256^2", tvc, tnc, tcc, 256)
measure("cube (12 tris) @1024^2", tvc, tnc, tcc, 1024)

# stage split of the tiny-scene frame at 1024^2: what is fixed where?
config = RenderConfig(height=1024, width=1024, fov=45)
from cython3dmodelrenderer_tpu.ops import binsort_pallas
from cython3dmodelrenderer_tpu.ops.projection import (project_to_screen,
                                                      visibility_masks)

th, tw = raster_pallas.TILE_H, raster_pallas.TILE_W
group = raster_pallas.GROUP
sub = 128 // group
ntx = -(-config.width // tw)
nty = -(-config.height // th)
nty_g = -(-nty // group) * group
deg, back = visibility_masks(tv1, tn1)
act = jnp.logical_and(~deg, ~back)
ts = project_to_screen(tv1, config)
rows, tx0, cx, ty0, cy, counts, _ = raster_pallas._plane_stage(
    ts, tc1, tn1, act, config, th, tw)
p_cap = 4096
ru = raster_pallas._ROWS_USED

print("== stage split, one triangle @1024^2 ==")


def s_bin(x, i):
    out = binsort_pallas.bin_gather_grouped(
        rows[:, :ru] + x * EPS, tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
        slot_cap=p_cap, group=group, sub=sub)
    return x + out[0][0, 0] * EPS


print(f"  binning (sort+tables+gather): "
      f"{timeit(chain(s_bin)) - fresh_calib():7.3f} ms", flush=True)

(binned, gstarts, gchunks, stids, sstripes, _tc, _tot, _na) = \
    binsort_pallas.bin_gather_grouped(
        rows[:, :ru], tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
        slot_cap=p_cap, group=group, sub=sub)


def s_raster(x, i):
    packed, u8b = raster_pallas._raster_tiles_grouped(
        binned + x * EPS, gstarts, gchunks, stids, sstripes, ntx, nty_g,
        th, tw, 128, group, config.z_init, False, post="u8")
    return x + packed[0, 0, 0, 0] * EPS


print(f"  raster grid (mostly empty groups): "
      f"{timeit(chain(s_raster)) - fresh_calib():7.3f} ms", flush=True)

(binned2, gstarts2, gchunks2, stids2, sstripes2, _t2, _tt2, _n2) = \
    binsort_pallas.bin_gather_grouped(
        rows[:, :ru], tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
        slot_cap=p_cap, group=group, sub=sub)
_packed, u8b = raster_pallas._raster_tiles_grouped(
    binned2, gstarts2, gchunks2, stids2, sstripes2, ntx, nty_g,
    th, tw, 128, group, config.z_init, False, post="u8")


def s_assemble(x, i):
    # x-dependent runtime-identity select: defeats cross-iteration CSE of
    # the gather (a constant input would hoist out of the chain)
    u8p = jnp.where(x < jnp.float32(-1), jnp.uint8(1), u8b)
    img = raster_pallas.assemble_u8_image(
        u8p, stids2, config, th, tw, group)
    return x + img[0, 0, 0].astype(jnp.float32) * EPS


print(f"  u8 image assembly (gather):   "
      f"{timeit(chain(s_assemble)) - fresh_calib():7.3f} ms", flush=True)
