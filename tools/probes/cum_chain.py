"""Cumulative full-frame chain: the HONEST per-stage decomposition.

Each level adds one pipeline stage to a 64-iteration dependent chain
inside one jit (the carry perturbs the triangle vertices, so EVERY stage
re-executes per iteration — single-stage chains let XLA hoist any
subgraph that doesn't depend on the perturbed input, which silently
under-measured span-only binning work in stage_chain3). Consecutive
level deltas are the marginal stage costs under one consistent
methodology; the tunnel round-trip (25-46 ms, drifting) divides by
NITER=64 and the calibration chain is re-measured per level.

Usage: python tools/probes/cum_chain.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import _posed
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import raster_pallas, binning, binsort_pallas
from cython3dmodelrenderer_tpu.ops.projection import project_to_screen, visibility_masks

NITER = 64
EPS = jnp.float32(1e-30)
model = _posed("T-Rex.obj")
tv = model.vertices_by_triangles
tn = model.normals_by_triangles
tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
config = RenderConfig(height=1024, width=1024, fov=45)
th, tw = raster_pallas.TILE_H, raster_pallas.TILE_W
group = raster_pallas.GROUP
sub = 128 // group
ntx = -(-config.width // tw); nty = -(-config.height // th)
nty_g = -(-nty // group) * group
deg0, back0 = visibility_masks(tv, tn)
act0 = jnp.logical_and(~deg0, ~back0)
ts0 = project_to_screen(tv, config)
total = raster_pallas.grouped_slot_total(ts0, act0, config)
p_cap = binning.capacity_bucket(int(total) * 5 // 4, 128)
ru = raster_pallas._ROWS_USED
print("p_cap", p_cap, flush=True)

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

def calib():
    return timeit(chain(lambda x, i: x + i.astype(jnp.float32) * EPS))

def upto(level):
    def s(x, i):
        tvx = tv + x * EPS
        deg, back = visibility_masks(tvx, tn)
        act = jnp.logical_and(~deg, ~back)
        ts = project_to_screen(tvx, config)
        if level == 0:
            return x + ts[0, 0, 0] * EPS
        rows, tx0, cx, ty0, cy, counts, _ = raster_pallas._plane_stage(
            ts, tc, tn, act, config, th, tw)
        if level == 1:
            return x + rows[0, 0] * EPS
        out = binsort_pallas.bin_gather_grouped(
            rows[:, :ru], tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
            slot_cap=p_cap, group=group, sub=sub)
        binned, gstarts, gchunks, stids, sstripes = out[:5]
        if level == 2:
            return x + binned[0, 0] * EPS
        packed, u8b = raster_pallas._raster_tiles_grouped(
            binned, gstarts, gchunks, stids, sstripes, ntx, nty_g,
            th, tw, 128, group, config.z_init, False, post="u8",
            emit_gbuf=False)
        if level == 3:
            return x + u8b[0, 0, 0, 0].astype(jnp.float32) * EPS
        img = raster_pallas.assemble_u8_image(u8b, stids, config, th, tw, group)
        return x + img[0, 0, 0].astype(jnp.float32) * EPS
    return s

names = ["geometry+project", "+plane stage", "+binning", "+raster(u8)", "+assemble"]
prev = 0.0
for lvl in range(5):
    ms = timeit(chain(upto(lvl))) - calib()   # fresh calib per level
    print(f"{names[lvl]:20s}: cum {ms:7.3f} ms  (delta {ms - prev:7.3f})", flush=True)
    prev = ms
