"""Benchmarks for the BASELINE configs.

Default invocation prints ONE JSON line — the headline metric (T-Rex.obj @
1024x1024, README pose, fov=45; reference best: Version C / 8 threads at
9 ms per frame, README.md:76). ``--config {cube,bunny,trex,igor,turntable,
all}`` benchmarks the other BASELINE.md configs, one JSON line each.

The igor config's mesh is pruned from the mounted reference
(.MISSING_LARGE_BLOBS) — the committed, reproducible ``assets/igor_sphere.obj``
(displaced UV sphere, ``tools/make_igor_sphere.py``) stands in as the textured
mesh with igor's texture, exercising the same path (texture sampling at vertex
UVs + Lambert).
"""
import argparse
import json
import os
import time

import numpy as np

BASELINE_MS = 9.0  # Version C, 8 threads (reference README.md:76)
OBJECTS = os.environ.get("CRENDER_OBJECTS", "/root/reference/objects")


ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def _posed(name, pose=True):
    from cython3dmodelrenderer_tpu import Model, fit_model

    kwargs = {}
    base = OBJECTS
    if name == "igor_sphere.obj":  # committed mesh + reference texture
        base = ASSETS
        kwargs["external_texture_filename"] = os.path.join(
            OBJECTS, "igor_texture.png")
    model = Model.read_model(os.path.join(base, name), **kwargs)
    if pose:
        model.rotate([-90, 180, 0])
        model.rotate([10, -80, 0])
    fit_model(model)
    if name == "igor_sphere.obj":
        # fit_model normalizes RADIUS to 1 (reference model.py:160) and puts
        # the center at z=1 — a round mesh would touch the camera plane, so
        # push it one unit further back
        model.shift([0.0, 0.0, 1.0])
    return model


def _time_frames(fn, n_warm=3, n_iter=100, n_trials=3):
    """Best-of-N trials: the tunneled device's throughput is noisy, and each
    timing window carries ~30 ms of fixed tunnel round-trip latency — the
    window must be wide enough to amortize it (steady-state frame rate is
    the metric, matching the reference's loop timing)."""
    import jax

    for _ in range(n_warm):
        out = fn()
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter * 1e3)
    return best


def _bench_single(model, size, fov, illum, metric, vs_baseline=None,
                  fast_shade=False, sign_cover=False):
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu import (AdvancedPixelBufferFiller,
                                           GuroIllumination, NoIllumination)

    filler = AdvancedPixelBufferFiller(size, size, fov=fov,
                                       fast_shade=fast_shade,
                                       sign_cover=sign_cover)
    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    tc = model.colors_by_triangles
    if tc is None:
        rng = np.random.RandomState(0)
        per_tri = rng.randint(256, size=(model.n_triangles(), 3))
        tc = jnp.asarray(np.repeat(per_tri[:, None, :], 3, axis=1)
                         .astype(np.float32))
    shader = GuroIllumination([0, 0, 1]) if illum else NoIllumination()

    post = "lambert_u8" if illum else "u8"
    light = shader.light_direction if illum else None

    def frame():
        # shade+quantize fused into the frame's single dispatch; G-buffers
        # stay packed (the frame's deliverable is the shaded image — planar
        # stacks derive lazily if someone reads them)
        filler.render_arrays(tv, tn, tc, post=post, light=light)
        return filler._post_image

    first = frame()
    assert int(jnp.max(first)) > 0, f"{metric}: rendered an empty frame"
    ms = _time_frames(frame)
    tris = model.n_triangles()
    out = {
        "metric": metric,
        "value": round(ms, 3),
        "unit": "ms",
        "mtris_per_sec": round(tris / ms / 1e3, 3),
    }
    if vs_baseline is not None:
        out["vs_baseline"] = round(vs_baseline / ms, 3)
    return out


def bench_trex(sign_cover=False):
    tag = ", sign-cover fold" if sign_cover else ""
    return _bench_single(_posed("T-Rex.obj"), 1024, 45, illum=False,
                         metric="T-Rex.obj 1024x1024 ms/frame "
                                f"(README pose, fov=45{tag})",
                         vs_baseline=BASELINE_MS, sign_cover=sign_cover)


def bench_cube():
    return _bench_single(_posed("cube.obj", pose=False), 256, 90, illum=False,
                         metric="cube.obj 256x256 ms/frame (flat color)")


def bench_bunny():
    return _bench_single(_posed("bunny.obj"), 512, 45, illum=False,
                         metric="bunny.obj 512x512 ms/frame (z-test)")


def bench_igor():
    return _bench_single(_posed("igor_sphere.obj"), 1024, 45, illum=True,
                         metric="igor-config (igor_sphere+igor texture) "
                                "1024x1024 ms/frame (textured + Lambert)")


def bench_fast():
    """Opt-in fast-shade (Gouraud) mode — 3 attr channels, shaded image
    only; z-buffer bit-identical to the exact mode."""
    return _bench_single(_posed("T-Rex.obj"), 1024, 45, illum=True,
                         metric="T-Rex.obj 1024x1024 ms/frame "
                                "(fast-shade Gouraud mode, opt-in)",
                         vs_baseline=BASELINE_MS, fast_shade=True)


def bench_turntable(view_batch=1, fast_shade=False):
    import jax
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.config import RenderConfig
    from cython3dmodelrenderer_tpu.parallel import multiview

    model = _posed("T-Rex.obj")
    model.shift([0.0, 0.0, -1.0])  # recenter: turntable re-applies the shift
    tv = model.vertices_by_triangles
    tn = model.normals_by_triangles
    tc = jnp.asarray(model.colors_by_triangles, jnp.float32)
    config = RenderConfig(height=1024, width=1024, fov=45)
    angles = multiview.turntable_angles(64)
    # exact per-pose sizing: every rendered angle's demand is evaluated, so
    # no sampling headroom is needed — binsort/sort/gather costs scale with
    # the STATIC capacity, so a tight bucket is pure win (the check_capacity
    # assert below would catch any sizing error, including live-group
    # compaction overflow — it reports through the same demand channel)
    p_cap, g_cap = multiview.sequence_demand(tv, tn, angles, None, config,
                                             headroom=1.0,
                                             view_batch=view_batch)

    def sweep():
        # post="u8": display-ready uint8 frames, matching the reference's
        # uint8 BGR Buffer (and the single-frame bench's fused quantize)
        return multiview.render_turntable_pallas(tv, tn, tc, angles, config,
                                                 p_cap=p_cap, g_cap=g_cap,
                                                 check_capacity=True,
                                                 post="u8",
                                                 view_batch=view_batch,
                                                 fast_shade=fast_shade)

    _imgs, used = sweep()
    assert int(used) <= p_cap, \
        f"turntable bin demand {int(used)} overflowed p_cap {p_cap}"
    ms = _time_frames(sweep, n_warm=2, n_iter=3)
    tag = f", view_batch={view_batch}" if view_batch > 1 else ""
    if fast_shade:
        tag += ", fast-shade"
    return {
        "metric": f"64-camera T-Rex turntable 1024x1024 ms/view{tag}",
        "value": round(ms / 64, 3),
        "unit": "ms",
        "views": 64,
        "sweep_ms": round(ms, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None,
                        choices=["trex", "cube", "bunny", "igor",
                                 "turntable", "fast", "all"])
    parser.add_argument("--sign-cover", action="store_true",
                        help="opt-in sign-bit predicate fold (trex config "
                             "only; A/B against the exact default)")
    parser.add_argument("--view-batch", type=int, default=1,
                        help="views per kernel launch for the turntable "
                             "config (A/B against the per-view sweep)")
    parser.add_argument("--fast-sweep", action="store_true",
                        help="opt-in Gouraud fast-shade mode for the "
                             "turntable config")
    args = parser.parse_args()
    if args.sign_cover:
        if args.config not in (None, "trex"):
            parser.error("--sign-cover applies to the trex config only")
        print(json.dumps(bench_trex(sign_cover=True)))
        return
    if args.view_batch > 1 or args.fast_sweep:
        if args.config not in (None, "turntable"):
            parser.error("--view-batch/--fast-sweep apply to the turntable "
                         "config only")
        print(json.dumps(bench_turntable(view_batch=args.view_batch,
                                         fast_shade=args.fast_sweep)))
        return
    if args.config is None:
        args.config = "trex"
    benches = {
        "trex": bench_trex,
        "cube": bench_cube,
        "bunny": bench_bunny,
        "igor": bench_igor,
        "turntable": bench_turntable,
        "fast": bench_fast,
    }
    names = list(benches) if args.config == "all" else [args.config]
    for name in names:
        print(json.dumps(benches[name]()))


if __name__ == "__main__":
    main()
