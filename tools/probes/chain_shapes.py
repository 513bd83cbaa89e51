"""Unrolled vs fori_loop vs scan chained frames — where does ~0.6 ms go?

stage_chain3 (20 UNROLLED frames in one jit) netted ~1.17 ms/frame while
dispatch_overlap's fori_loop chain and the bench loop both measure ~1.84.
Either the while-loop carries real per-iteration overhead the unrolled
schedule avoids, or the unrolled number is RTT-jitter artifact (each timing
includes one ~30 ms tunnel round trip; at NITER=20 a few ms of jitter is
~0.2 ms/frame). This probe times all chain shapes at NITER large enough to
bury the RTT (and prints the raw walls so the jitter is visible).
Usage: python tools/probes/chain_shapes.py [NITER]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import _posed
from cython3dmodelrenderer_tpu import AdvancedPixelBufferFiller
from cython3dmodelrenderer_tpu.ops import raster_pallas

NITER = int(sys.argv[1]) if len(sys.argv) > 1 else 100

model = _posed("T-Rex.obj")
filler = AdvancedPixelBufferFiller(1024, 1024, fov=45)
tv = model.vertices_by_triangles
tn = model.normals_by_triangles
tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
filler.render_arrays(tv, tn, tc, post="u8")
jax.block_until_ready(filler._post_image)
p_cap, group = filler._p_cap, filler._group
config = filler.config


def one_frame(carry):
    _out, _tot, _act, img = raster_pallas.render_frame(
        tv + carry * 1e-30, tn, tc, config, p_cap, 0,
        group=group, post="u8", packed_out=True)
    return carry + img[0, 0, 0].astype(jnp.float32) * jnp.float32(1e-30)


@jax.jit
def chain_fori(x0):
    return jax.lax.fori_loop(0, NITER, lambda i, c: one_frame(c), x0)


@jax.jit
def chain_scan4(x0):
    def step(c, _):
        return one_frame(c), ()

    return jax.lax.scan(step, x0, None, length=NITER, unroll=4)[0]


@jax.jit
def chain_unrolled(x0):
    x = x0
    for _ in range(NITER):
        x = one_frame(x)
    return x


def timed(label, fn):
    jax.block_until_ready(fn(jnp.float32(0.0)))   # compile
    walls = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jnp.float32(0.0)))
        walls.append((time.perf_counter() - t0) * 1e3)
    best = min(walls)
    print(f"{label:16s} {best / NITER:7.3f} ms/frame   "
          f"walls {['%.1f' % w for w in walls]}")


timed("fori_loop", chain_fori)
timed("scan(unroll=4)", chain_scan4)
if NITER <= 100:
    timed("unrolled", chain_unrolled)
