"""In-situ slope probe for the grouped raster kernel (PERF_NOTES roadmap 1).

Replicates (a) the chunk-body ALU block and (b) the per-stripe epilogue
block R times INSIDE the production kernel (``probe_reps`` in
``_make_kernel_grouped`` — same layouts, same compiler) and fits ms vs R:

    kernel_ms(R_body, R_epi) = fixed + R_body * body_ms + R_epi * epi_ms

The slopes are the true marginal cost of the chunk-loop arithmetic and the
epilogue reductions; the intercept is everything else (DMA issue/wait,
grid/setup, output DMA). This is the honest replacement for the rejected
synthetic vpu_cal.py probe. Chained timing (stage_chain3-style runtime-
carry perturbation) defeats DCE/CSE across iterations.

Replica perturbations are runtime-identity (+rep*1e-30 folds in f32), so
rep 0 computes the production values — the probe kernel's output stays
correct, which `--check` asserts against the unreplicated kernel.

Usage: python raster_slope.py [group] [--check]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import _posed
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import binning, binsort_pallas, raster_pallas
from cython3dmodelrenderer_tpu.ops.projection import (project_to_screen,
                                                      visibility_masks)

NITER = 20

model = _posed("T-Rex.obj")
config = RenderConfig(height=1024, width=1024, fov=45)
tv = model.vertices_by_triangles
tn = model.normals_by_triangles
tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
th, tw = raster_pallas.TILE_H, raster_pallas.TILE_W
chunk = 128
group = raster_pallas.GROUP
check = "--check" in sys.argv
for a in sys.argv[1:]:
    if a.isdigit():
        group = int(a)
sub = chunk // group
ntx = -(-config.width // tw)
nty = -(-config.height // th)
nty_g = -(-nty // group) * group

deg, back = visibility_masks(tv, tn)
act = jnp.logical_and(~deg, ~back)
ts = project_to_screen(tv, config)
rows, tx0, cx, ty0, cy, counts, total = raster_pallas._plane_stage(
    ts, tc, tn, act, config, th, tw)
p_cap = int(raster_pallas.grouped_slot_total(ts, act, config, group=group))
p_cap = binning.capacity_bucket(int(p_cap * 1.25), 128)
ru = raster_pallas._ROWS_USED

(binned, gstarts, gchunks, stids, sstripes, tile_counts, total_slots,
 n_active) = binsort_pallas.bin_gather_grouped(
    rows[:, :ru], tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
    slot_cap=p_cap, group=group, sub=sub)
n_chunks = int(jnp.sum(gchunks))
n_stripes = int(jnp.sum(tile_counts > 0))
n_negroups = int(jnp.sum(gchunks > 0))
print(f"group {group}  p_cap {p_cap}  chunks {n_chunks} "
      f"nonempty stripes {n_stripes} nonempty groups {n_negroups}")

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


calib = timeit(chain(lambda x, i: x + i.astype(jnp.float32) * EPS))
print(f"calibration {calib:7.3f} ms")


def raster_ms(body_reps: int, epi_reps: int) -> float:
    def s(x, i):
        packed, _u8 = raster_pallas._raster_tiles_grouped(
            binned + x * EPS, gstarts, gchunks, stids, sstripes, ntx,
            nty_g, th, tw, chunk, group, config.z_init, False,
            probe_reps=(body_reps, epi_reps))
        return x + packed[0, 0, 0, 0] * EPS
    return timeit(chain(s)) - calib


if check:
    ref, _ = raster_pallas._raster_tiles_grouped(
        binned, gstarts, gchunks, stids, sstripes, ntx, nty_g, th, tw,
        chunk, group, config.z_init, False)
    for reps in ((2, 1), (1, 2), (3, 3)):
        got, _ = raster_pallas._raster_tiles_grouped(
            binned, gstarts, gchunks, stids, sstripes, ntx, nty_g, th, tw,
            chunk, group, config.z_init, False, probe_reps=reps)
        same = np.array_equal(np.asarray(got), np.asarray(ref))
        print(f"probe_reps={reps}: output {'EXACT' if same else 'DIFFERS'}")

REPS = (1, 2, 4, 6)
body = [raster_ms(r, 1) for r in REPS]
epi = [raster_ms(1, r) for r in REPS]
for r, b, e in zip(REPS, body, epi):
    print(f"R={r}:  body-replicated {b:7.3f} ms   epi-replicated {e:7.3f} ms")

# least-squares slope (ms per extra replica)
x = np.asarray(REPS, np.float64)
bslope, bint = np.polyfit(x, np.asarray(body), 1)
eslope, eint = np.polyfit(x, np.asarray(epi), 1)
base = raster_ms(1, 1)
print(f"\nkernel (1,1): {base:7.3f} ms")
print(f"chunk-body ALU : {bslope:7.3f} ms/frame "
      f"({bslope / max(n_chunks, 1) * 1e3:6.2f} us/chunk, intercept "
      f"{bint:6.3f})")
print(f"epilogue       : {eslope:7.3f} ms/frame "
      f"({eslope / max(n_negroups, 1) * 1e3:6.2f} us/group, intercept "
      f"{eint:6.3f})")
print(f"fixed overhead : {base - bslope - eslope:7.3f} ms "
      f"(kernel - body - epi)")
