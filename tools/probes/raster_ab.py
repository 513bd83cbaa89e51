"""A/B the grouped raster kernel's knobs, chained-in-jit (DCE-proof).

Knobs probed, all on the SAME binned T-Rex frame:

* input-DMA buffer depth ``nbuf`` (2 = shipping default). Hypothesis:
  per-chunk cost (~5.5 us measured vs ~0.6 us ALU floor) is dominated by
  latency the 2-deep pipeline can't hide; deeper buffering is nearly free
  in VMEM (34x128 f32 = 17 KB per slot).
* ``sign_cover`` — a pure-ALU delta (-190 vreg-ops/chunk, DMA identical):
  the time delta against the default IS the real-kernel calibration of
  seconds/vreg-op (the synthetic vpu_cal kept getting folded by Mosaic).
* ``n_attrs=3`` (fast-shade rows) — ALU -396/chunk AND input rows 34->25,
  output block halved; the delta beyond the sign_cover-implied ALU share
  measures the DMA-bound component.

Usage: python tools/probes/raster_ab.py [group]
"""
import time, sys
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from bench import _posed
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import binning, binsort_pallas, raster_pallas
from cython3dmodelrenderer_tpu.ops.projection import project_to_screen, visibility_masks

NITER = 20

model = _posed("T-Rex.obj")
config = RenderConfig(height=1024, width=1024, fov=45)
tv = model.vertices_by_triangles
tn = model.normals_by_triangles
tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
th, tw = raster_pallas.TILE_H, raster_pallas.TILE_W
chunk = 128
group = int(sys.argv[1]) if len(sys.argv) > 1 else raster_pallas.GROUP
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
print(f"group {group} p_cap {p_cap} chunks {int(jnp.sum(gchunks))}",
      flush=True)

EPS = jnp.float32(1e-30)


def timeit(name, fn, calib=0.0):
    f = jax.jit(fn)
    jax.block_until_ready(f(jnp.float32(0)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(jnp.float32(0)))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    ms = best / NITER
    print(f"{name:40s} {ms:7.3f} ms  (net {ms - calib:7.3f})", flush=True)
    return ms


def chain(stage):
    def run(x0):
        x = x0
        for i in range(NITER):
            x = stage(x, jnp.int32(i + 1))
        return x
    return run


calib = timeit("calibration (empty chain)",
               chain(lambda x, i: x + i.astype(jnp.float32) * EPS))

for nbuf in (2, 3, 4, 6, 8):
    def s_raster(x, i, nbuf=nbuf):
        chans, _u8 = raster_pallas._raster_tiles_grouped(
            binned + x * EPS, gstarts, gchunks, stids, sstripes, ntx,
            nty_g, th, tw, chunk, group, config.z_init, False, nbuf=nbuf)
        return x + chans[0, 0, 0, 0] * EPS

    timeit(f"raster grouped nbuf={nbuf}", chain(s_raster), calib)


def s_sign(x, i):
    chans, _u8 = raster_pallas._raster_tiles_grouped(
        binned + x * EPS, gstarts, gchunks, stids, sstripes, ntx,
        nty_g, th, tw, chunk, group, config.z_init, False, sign_cover=True)
    return x + chans[0, 0, 0, 0] * EPS

timeit("raster sign_cover (ALU -190/chunk)", chain(s_sign), calib)

# fast-shade rows: rebin with 25-wide rows (3 attr channels)
ru3 = raster_pallas._rows_used(3)
(binned3, gstarts3, gchunks3, stids3, sstripes3, _tc3, _ts3,
 _na3) = binsort_pallas.bin_gather_grouped(
    rows[:, :ru3], tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
    slot_cap=p_cap, group=group, sub=sub)


def s_fast(x, i):
    chans, _u8 = raster_pallas._raster_tiles_grouped(
        binned3 + x * EPS, gstarts3, gchunks3, stids3, sstripes3, ntx,
        nty_g, th, tw, chunk, group, config.z_init, False, n_attrs=3)
    return x + chans[0, 0, 0, 0] * EPS

timeit("raster fast rows (ALU -396, DMA -26%)", chain(s_fast), calib)
