import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
from cython3dmodelrenderer_tpu import Model, fit_model
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import raster_pallas, binning
from cython3dmodelrenderer_tpu.ops.projection import project_to_screen, visibility_masks

model = Model.read_model("/root/reference/objects/T-Rex.obj")
model.rotate([-90,180,0]); model.rotate([10,-80,0]); fit_model(model)
tv, tn = model.vertices_by_triangles, model.normals_by_triangles
tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
config = RenderConfig(height=1024, width=1024, fov=45)
deg, bf = visibility_masks(tv, tn); active = ~deg & ~bf
ts = project_to_screen(tv, config)
TH, TW, CH = 8, 128, 128
ntx, nty = 8, 128
rows, attr_rows, tx0, cx, ty0, cy, counts = binning.plane_data(ts, active, config, TH, TW, colors=tc, normals=tn)
p_cap, total = binning.required_pair_capacity(counts, CH)
binned, starts, tcounts = binning.bin_pairs(rows, tx0, cx, ty0, cy, counts, p_cap, ntx, nty, CH)
z_img, p_img = raster_pallas._raster_tiles(binned, starts, tcounts, p_cap, ntx, nty, TH, TW, CH, False)
jax.block_until_ready((z_img, p_img))

def t(f, n=20):
    r=f(); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r=f()
    jax.block_until_ready(r); return (time.time()-t0)/n*1e3

log("geometry (proj+masks):", t(lambda: project_to_screen(tv, config)))
log("plane_data:", t(lambda: binning.plane_data(ts, active, config, TH, TW, colors=tc, normals=tn)))
log("bin_pairs:", t(lambda: binning.bin_pairs(rows, tx0, cx, ty0, cy, counts, p_cap, ntx, nty, CH)))
log("kernel:", t(lambda: raster_pallas._raster_tiles(binned, starts, tcounts, p_cap, ntx, nty, TH, TW, CH, False)))
log("resolve:", t(lambda: raster_pallas._resolve_planes(attr_rows, z_img, p_img, config)))

# bin_pairs internals
@jax.jit
def sort_only(tile):
    return jnp.argsort(tile, stable=True)
tile_ids = jnp.asarray(np.random.randint(0, 1024, p_cap).astype(np.int32))
log("argsort p_cap:", t(lambda: sort_only(tile_ids)))
perm = jnp.asarray(np.random.permutation(p_cap).astype(np.int32))[:p_cap]
tri_idx = jnp.asarray(np.random.randint(0, 13814, p_cap).astype(np.int32))
@jax.jit
def gather_rows(idx):
    return rows[idx]
log("rows gather (p_cap,128):", t(lambda: gather_rows(tri_idx)))
@jax.jit
def searchsorteds(st):
    a = jnp.searchsorted(st, jnp.arange(13814), side="right")
    return a
log("searchsorted p_cap x T:", t(lambda: jnp.searchsorted(jnp.sort(tile_ids), jnp.arange(1024, dtype=jnp.int32), side="left")))
