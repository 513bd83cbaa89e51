import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
from cython3dmodelrenderer_tpu import Model, fit_model
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import raster_ref, raster_pallas
from cython3dmodelrenderer_tpu.ops.projection import project_to_screen, visibility_masks

model = Model.read_model("/root/reference/objects/T-Rex.obj")
model.rotate([-90,180,0]); model.rotate([10,-80,0]); fit_model(model)
tv, tn = model.vertices_by_triangles, model.normals_by_triangles
tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
config = RenderConfig(height=1024, width=1024, fov=45)
deg, bf = visibility_masks(tv, tn); active = ~deg & ~bf
ts = project_to_screen(tv, config)

t0=time.time()
c2, z2, n2 = raster_pallas.rasterize(ts, tc, tn, active, config)
jax.block_until_ready((c2,z2,n2))
log("pallas compile+run:", time.time()-t0)

t0=time.time()
for _ in range(20):
    c2, z2, n2 = raster_pallas.rasterize(ts, tc, tn, active, config)
jax.block_until_ready((c2,z2,n2))
log("pallas per frame ms:", (time.time()-t0)/20*1e3)

bbox = raster_ref.required_bbox_size(ts, active, config)
c1, z1, n1 = raster_ref.rasterize(ts, tc, tn, active, config, bbox_size=bbox)
z1, z2n = np.asarray(z1), np.asarray(z2)
# compare z with relative tolerance; also count winner disagreements via color
mism = ~np.isclose(z1, z2n, atol=1e-4, rtol=1e-4)
log("z mismatch frac @1e-4:", mism.mean())
mism6 = ~np.isclose(z1, z2n, atol=1e-6, rtol=1e-6)
log("z mismatch frac @1e-6:", mism6.mean())
cdiff = np.abs(np.asarray(c1)-np.asarray(c2)).max(-1)
log("color mismatch >1 frac:", (cdiff > 1.0).mean())
