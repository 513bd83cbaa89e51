"""Does the tunnel pipeline independent dispatches, or serialize them?

bench wall (1.86 ms) = chained device frame (1.32) + ~0.55 ms that PERF_NOTES
attributes to non-overlapping tunnel dispatch. This decomposes that gap:

  A. dependent  : block_until_ready after EVERY frame (full round-trip each)
  B. independent: bench.py's actual loop — N dispatches, one block at the end.
                  If the tunnel queues >1 in-flight program, host enqueue
                  overlaps device compute and B approaches C.
  C. chained    : N frames inside ONE jit via lax.fori_loop (device floor,
                  zero per-frame host work).

B - C = per-frame cost of (python jit-call overhead + tunnel enqueue) that
does NOT overlap device compute. A - B = the tail-latency round trip.
Usage: python tools/probes/dispatch_overlap.py
"""
import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import _posed
from cython3dmodelrenderer_tpu import AdvancedPixelBufferFiller
from cython3dmodelrenderer_tpu.ops import raster_pallas

NITER = 100

model = _posed("T-Rex.obj")
filler = AdvancedPixelBufferFiller(1024, 1024, fov=45)
tv = model.vertices_by_triangles
tn = model.normals_by_triangles
tc = jnp.asarray(model.colors_by_triangles, jnp.float32)


def frame():
    filler.render_arrays(tv, tn, tc, post="u8")
    return filler._post_image


# warm + capacity sync
jax.block_until_ready(frame())
p_cap, group = filler._p_cap, filler._group


def timed(label, fn, n=NITER):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"{label:12s} {best:7.3f} ms/frame")
    return best


def run_dependent():
    for _ in range(NITER):
        jax.block_until_ready(frame())


def run_independent():
    out = None
    for _ in range(NITER):
        out = frame()
    jax.block_until_ready(out)


timed("dependent", run_dependent)
timed("independent", run_independent)


# C: NITER frames inside one jit. Input nudged by the carry (defeats CSE);
# output consumed into the carry (defeats DCE).
@jax.jit
def chained():
    def body(_, carry):
        _out, _tot, _act, img = raster_pallas.render_frame(
            tv + carry * 1e-30, tn, tc, filler.config, p_cap, 0,
            group=group, post="u8", packed_out=True)
        return img[0, 0, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))


jax.block_until_ready(chained())
timed("chained", lambda: jax.block_until_ready(chained()))
