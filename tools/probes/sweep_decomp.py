"""Decompose the turntable sweep's per-view cost.

Questions (from the 2.116 ms/view vs ~1.3 ms chained-frame gap):
  1. fixed-vs-linear: sweep wall at N views -> slope = true per-view cost,
     intercept = dispatch + first-iteration overhead.
  2. post="u8" vs "f32": output-traffic share.
  3. single-frame render_frame dispatch wall for the same pose, for the
     apples-to-apples per-dispatch number.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from cython3dmodelrenderer_tpu import Model, fit_model
from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.parallel import multiview

model = Model.read_model("/root/reference/objects/T-Rex.obj")
model.rotate([-90, 180, 0]); model.rotate([10, -80, 0]); fit_model(model)
tv = model.vertices_by_triangles
tn = model.normals_by_triangles
tc = model.colors_by_triangles
config = RenderConfig(height=1024, width=1024, fov=45)
p_cap = multiview.turntable_capacity(tv, tn, config)
print("p_cap", p_cap, flush=True)


def wall(fn, n_warm=2, n_iter=20):
    for _ in range(n_warm):
        jax.block_until_ready(fn())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = fn()
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1e3


# --- capacity sensitivity: binsort/sort/gather scale with the STATIC
# slot_cap, so the sweep's peak*1.5 bucket may cost real ms/view over the
# single-frame total*1.25 bucket
from cython3dmodelrenderer_tpu.ops import binning, raster_pallas
from cython3dmodelrenderer_tpu.ops.projection import (project_to_screen,
                                                      visibility_masks)
deg, bf = visibility_masks(tv, tn)
act = jnp.logical_and(~deg, ~bf)
ts = project_to_screen(tv, config)
single_total = int(raster_pallas.grouped_slot_total(ts, act, config))
single_cap = binning.capacity_bucket(single_total * 5 // 4, 128)
print(f"single-frame total {single_total} cap {single_cap}; sweep cap {p_cap}",
      flush=True)
angles64 = multiview.turntable_angles(64)
for cap in sorted({single_cap, p_cap, binning.capacity_bucket(p_cap * 2, 128)}):
    def sweep(cap=cap):
        return multiview.render_turntable_pallas(
            tv, tn, tc, angles64, config, cap, post="u8")
    ms = wall(sweep, n_iter=3)
    print(f"cap={cap:7d}  64-view wall={ms:8.2f} ms  per-view={ms/64:6.3f}",
          flush=True)

for post in ("u8", "f32"):
    xs, ys = [], []
    for n in (1, 2, 4, 8, 16, 32, 64):
        angles = multiview.turntable_angles(n)

        def sweep(angles=angles):
            return multiview.render_turntable_pallas(
                tv, tn, tc, angles, config, p_cap, post=post)

        ms = wall(sweep, n_iter=max(3, 200 // n))
        xs.append(n); ys.append(ms)
        print(f"post={post} N={n:3d}  wall={ms:8.2f} ms  per-view={ms/n:6.3f}",
              flush=True)
    # least-squares slope over the larger Ns (amortized regime)
    a = np.polyfit(xs[2:], ys[2:], 1)
    print(f"post={post}: slope {a[0]:.3f} ms/view, intercept {a[1]:.2f} ms",
          flush=True)
