"""Chained in-jit stage timing, DCE-proof AND CSE-proof.

Each iteration perturbs the stage input with the RUNTIME CARRY ``x`` (the
loop counter ``i`` is a trace-time constant: ``tv + i*1e-30`` folds back to
``tv`` exactly in f32, CSE then merges all NITER iterations into ONE — a
measured failure mode that reported a 0.11 ms "full frame") and consumes
the output via sum()*1e-30 added to the carry (defeats constant-fold + DCE).
Integer stage inputs perturb via ``zi(x)`` — a runtime-zero the compiler
cannot fold. The x-dependence also SERIALIZES iterations (independent
iterations would be free to CSE or reorder). Per-stage cost = timed - calib.
Usage: python stage_chain3.py [group]
"""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from bench import _posed
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import binning, binsort_pallas, raster_pallas
from cython3dmodelrenderer_tpu.ops.sort_pallas import bitonic_sort_i32
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
print("group", group, "p_cap", p_cap, "pairs", int(total))
ru = raster_pallas._ROWS_USED

(binned, gstarts, gchunks, stids, sstripes, tile_counts, total_slots,
 n_active) = binsort_pallas.bin_gather_grouped(
    rows[:, :ru], tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
    slot_cap=p_cap, group=group, sub=sub)
print("total_slots", int(total_slots), "chunks", int(jnp.sum(gchunks)),
      "nonempty tiles", int(jnp.sum(tile_counts > 0)))

EPS = jnp.float32(1e-30)


def timeit(name, fn, calib=0.0):
    f = jax.jit(fn)
    out = f(jnp.float32(0))
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(jnp.float32(0)))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    ms = best / NITER
    print(f"{name:40s} {ms:7.3f} ms  (net {ms - calib:7.3f})")
    return ms


def chain(stage):
    def run(x0):
        x = x0
        for i in range(NITER):
            x = stage(x, jnp.int32(i + 1))
        return x
    return run


def zi(x):
    """Runtime-zero int32 derived from the carry — un-foldable, serializing."""
    return (x * EPS > 1.0).astype(jnp.int32)


calib = timeit("calibration (empty chain)",
               chain(lambda x, i: x + i.astype(jnp.float32) * EPS))


def s_bin(x, i):
    out = binsort_pallas.bin_gather_grouped(
        rows[:, :ru], tx0 + zi(x), cx, ty0, cy, ntx=ntx, nty=nty_g,
        slot_cap=p_cap, group=group, sub=sub)
    return x + jnp.sum(out[0][:, 0]) * EPS

timeit("bin_gather_grouped (full binning)", chain(s_bin), calib)


def s_histogram(x, i):
    tcnt, st, ss, gc = binsort_pallas.group_histogram(
        tx0 + zi(x), cx, ty0, cy, ntx, nty_g, group, sub)
    return x + jnp.sum(gc).astype(jnp.float32) * EPS

timeit("  histogram (matmul+group tables)", chain(s_histogram), calib)

keys0 = jnp.arange(p_cap, dtype=jnp.int32)[::-1]


def s_sort(x, i):
    s = bitonic_sort_i32((keys0 + zi(x)) & 0x7fffffff)
    return x + jnp.sum(s[:8]).astype(jnp.float32) * EPS

timeit("  bitonic sort alone", chain(s_sort), calib)


def s_expand(x, i):
    tri_p, tile_p, n_pairs = binsort_pallas._expand_pairs(
        tx0 + zi(x), cx, ty0, cy, ntx, p_cap)
    return x + (jnp.sum(tri_p[:8] + tile_p[:8]) + n_pairs
                ).astype(jnp.float32) * EPS

timeit("  pair expansion (2 scatter-ffills)", chain(s_expand), calib)


def s_scatter(x, i):
    # ONE 1-D scatter+cummax fill-forward, isolated (the expansion has two)
    z = jnp.zeros((p_cap,), jnp.int32)
    v = jax.lax.cummax(z.at[(tx0 + zi(x)) % p_cap].set(
        jnp.arange(tx0.shape[0], dtype=jnp.int32), mode="drop"))
    return x + jnp.sum(v[:8]).astype(jnp.float32) * EPS

timeit("  one scatter+cummax ffill", chain(s_scatter), calib)


def s_rowgather(x, i):
    # the two row gathers of the binning path, isolated
    g = rows[:, :ru][(jnp.arange(p_cap) + zi(x)) % rows.shape[0]]
    return x + jnp.sum(g[:, 0]) * EPS

timeit("  one (p_cap, 35) row gather", chain(s_rowgather), calib)


def s_raster(x, i):
    packed, _u8 = raster_pallas._raster_tiles_grouped(
        binned + x * EPS, gstarts, gchunks, stids, sstripes, ntx,
        nty_g, th, tw, chunk, group, config.z_init, False)
    return x + packed[0, 0, 0, 0] * EPS

timeit("raster grouped (kernel, packed out)", chain(s_raster), calib)


def s_geometry(x, i):
    deg2, back2 = visibility_masks(tv + x * EPS, tn)
    act2 = jnp.logical_and(~deg2, ~back2)
    ts2 = project_to_screen(tv + x * EPS, config)
    return x + (ts2[0, 0, 0] + act2[0].astype(jnp.float32)) * EPS

timeit("geometry stage (cull+project)", chain(s_geometry), calib)


def s_planes(x, i):
    r2 = raster_pallas._plane_stage(
        ts + x * EPS, tc, tn, act, config, th, tw)
    return x + jnp.sum(r2[0][:, 0]) * EPS

timeit("plane stage", chain(s_planes), calib)


def s_frame(x, i):
    out = raster_pallas.render_frame(
        tv + x * EPS, tn, tc, config,
        p_cap=p_cap, grid_cap=ntx * nty, group=group, post="u8")
    return x + out[3][0, 0, 0].astype(jnp.float32) * EPS

timeit("FULL frame (render_frame, post=u8)", chain(s_frame), calib)


def s_frame_raw(x, i):
    # post="none": subtracting from the post=u8 frame isolates the fused
    # shade/quantize epilogue + its extra output materialization
    out = raster_pallas.render_frame(
        tv + x * EPS, tn, tc, config,
        p_cap=p_cap, grid_cap=ntx * nty, group=group, post="none")
    return x + out[0][0][0, 0, 0] * EPS

timeit("FULL frame (post=none)", chain(s_frame_raw), calib)


def s_frame_packed(x, i):
    out = raster_pallas.render_frame(
        tv + x * EPS, tn, tc, config,
        p_cap=p_cap, grid_cap=ntx * nty, group=group, post="u8",
        packed_out=True)
    return x + out[3][0, 0, 0].astype(jnp.float32) * EPS

timeit("FULL frame (post=u8, packed_out)", chain(s_frame_packed), calib)


def s_frame_packed_raw(x, i):
    out = raster_pallas.render_frame(
        tv + x * EPS, tn, tc, config,
        p_cap=p_cap, grid_cap=ntx * nty, group=group, post="none",
        packed_out=True)
    return x + out[0][0, 0] * EPS

timeit("FULL frame (post=none, packed_out)", chain(s_frame_packed_raw),
       calib)
