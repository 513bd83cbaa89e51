"""Pallas rasterizer parity vs the jnp backend (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from cython3dmodelrenderer_tpu.config import RenderConfig
from cython3dmodelrenderer_tpu.ops import raster_pallas, raster_ref
from cython3dmodelrenderer_tpu.ops.projection import (project_to_screen,
                                                      visibility_masks)
from tests.test_raster import random_scene


def run_both(tris, colors, normals, config):
    tv = jnp.asarray(tris)
    tn = jnp.asarray(normals)
    tc = jnp.asarray(colors)
    degenerate, backfacing = visibility_masks(tv, tn)
    active = ~degenerate & ~backfacing
    ts = project_to_screen(tv, config)
    bbox = raster_ref.required_bbox_size(ts, active, config)
    ref = raster_ref.rasterize(ts, tc, tn, active, config,
                               bbox_size=bbox, chunk=16)
    pal = raster_pallas.rasterize(ts, tc, tn, active, config, interpret=True)
    return ref, pal


def assert_match(ref, pal, edge_tol=0.0):
    """Compare G-buffers; ``edge_tol`` is the allowed fraction of differing
    pixels (plane-form λ vs ratio-form λ can disagree exactly on edges)."""
    for a, b, tol in [(ref[1], pal[1], 1e-5), (ref[0], pal[0], 0.5),
                      (ref[2], pal[2], 1e-3)]:
        a, b = np.asarray(a), np.asarray(b)
        frac = (np.abs(a - b).max(axis=-1) > tol).mean()
        assert frac <= edge_tol, f"mismatch fraction {frac} > {edge_tol}"


def test_single_triangle():
    config = RenderConfig(height=64, width=128, fov=90)
    tris = np.array([[[-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0]]],
                    np.float32)
    normals = np.full((1, 3, 3), [0, 0, -1], np.float32)
    colors = np.full((1, 3, 3), 200.0, np.float32)
    ref, pal = run_both(tris, colors, normals, config)
    assert np.asarray(pal[0]).max() > 0
    assert_match(ref, pal)


def test_random_scene():
    config = RenderConfig(height=96, width=128, fov=60)
    tris, colors, normals = random_scene(t=60, seed=1)
    ref, pal = run_both(tris, colors, normals, config)
    assert_match(ref, pal)


def test_dense_overlap_scene():
    """Many overlapping triangles → deep z-resolve with ties."""
    config = RenderConfig(height=64, width=64, fov=60)
    tris, colors, normals = random_scene(t=120, seed=3)
    # squash z so triangles overlap heavily
    tris[..., 2] = 1.0 + 0.01 * tris[..., 2]
    ref, pal = run_both(tris, colors, normals, config)
    assert_match(ref, pal, edge_tol=1e-3)


def test_determinism():
    config = RenderConfig(height=64, width=64, fov=60)
    tris, colors, normals = random_scene(t=40, seed=5)
    _, pal1 = run_both(tris, colors, normals, config)
    _, pal2 = run_both(tris, colors, normals, config)
    for a, b in zip(pal1, pal2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_capacity_bucket_monotonic():
    """capacity_bucket grows with demand, keeps alignment and headroom.

    (The actual overflow-and-re-render behavior is covered by
    ``test_overflow_auto_recovery`` and
    ``test_overflow_lazy_drain_repairs_growing_sweep`` below.)
    """
    from cython3dmodelrenderer_tpu.ops import binning

    small = binning.capacity_bucket(10, 128)
    big = binning.capacity_bucket(100000, 128)
    assert small < big and small % 4096 == 0 and big >= 100000 + 128


def test_grouped_kernel_dense_scene():
    """The grouped (G4) kernel vs the jnp oracle on a dense scene.

    Regression test for the culled-row stale-slot bug: unplaced bin slots
    clamp to arbitrary row indices, and a *culled* triangle's row used to
    carry a live bbox — letting backfacing geometry win pixels. plane_data
    now zeroes culled rows' bboxes (SAFETY INVARIANT).
    """
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.ops import binning
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    config = RenderConfig(height=96, width=128, fov=60)
    tris, colors, normals = random_scene(t=120, seed=1)
    tv, tn, tc = jnp.asarray(tris), jnp.asarray(normals), jnp.asarray(colors)
    degenerate, backfacing = visibility_masks(tv, tn)
    active = ~degenerate & ~backfacing
    ts = project_to_screen(tv, config)

    bbox = raster_ref.required_bbox_size(ts, active, config)
    ref = raster_ref.rasterize(ts, tc, tn, active, config,
                               bbox_size=bbox, chunk=16)

    rows, tx0, cx, ty0, cy, counts, _t = rp._stage_a(ts, tc, tn, active,
                                                     config, 8, 128)
    slots = int(rp.grouped_slot_total(ts, active, config,
                                  tile_h=8, tile_w=128, group=4))
    p_cap = binning.capacity_bucket(slots, 128)
    pal, _na, used, _pi = rp._stage_b_jit(rows, tx0, cx, ty0, cy, counts,
                                     config=config, p_cap=p_cap, grid_cap=0,
                                     tile_h=8, tile_w=128, chunk=128,
                                     interpret=True, group=4)
    assert int(used) <= p_cap
    assert_match(ref, pal)


def test_odd_image_sizes_grouped():
    """Non-tile-aligned image sizes through the grouped kernel (interpret)."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.ops import binning
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    for h, w in [(100, 100), (72, 200), (48, 130)]:
        config = RenderConfig(height=h, width=w, fov=60)
        tris, colors, normals = random_scene(t=30, seed=2)
        tv, tn, tc = (jnp.asarray(tris), jnp.asarray(normals),
                      jnp.asarray(colors))
        degenerate, backfacing = visibility_masks(tv, tn)
        active = ~degenerate & ~backfacing
        ts = project_to_screen(tv, config)
        bbox = raster_ref.required_bbox_size(ts, active, config)
        ref = raster_ref.rasterize(ts, tc, tn, active, config,
                                   bbox_size=bbox, chunk=16)
        rows, tx0, cx, ty0, cy, counts, _t = rp._stage_a(
            ts, tc, tn, active, config, 8, 128)
        slots = int(rp.grouped_slot_total(ts, active, config,
                                  tile_h=8, tile_w=128, group=4))
        p_cap = binning.capacity_bucket(slots, 128)
        pal, _na, _used, _pi = rp._stage_b_jit(rows, tx0, cx, ty0, cy, counts,
                                          config=config, p_cap=p_cap,
                                          grid_cap=0, tile_h=8, tile_w=128,
                                          chunk=128, interpret=True, group=4)
        assert pal[0].shape == (h, w, 3)
        assert_match(ref, pal)


def test_filler_capacity_resizes_on_model_change():
    """Switching scenes must re-size the cached capacity bucket.

    Uses the Pallas backend in interpreter mode so the capacity-cache code
    path (pallas branch of _rasterize) actually executes on CPU.
    """
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

    filler = AdvancedPixelBufferFiller(64, 64, fov=60, backend="pallas",
                                       interpret=True)
    small = random_scene(t=8, seed=0)
    big = random_scene(t=200, seed=1)
    caps = []
    for tris, colors, normals in (small, big, small):
        out = filler._rasterize(jnp.asarray(tris), jnp.asarray(normals),
                                jnp.asarray(colors))
        assert np.asarray(out[0]).shape == (64, 64, 3)
        assert int(filler._last_total) <= filler._p_cap
        caps.append(filler._p_cap)
    # the bucket was re-sized for the bigger scene
    assert caps[1] >= caps[0]
    assert filler._sized_for == small[0].shape[0]


def test_fuzz_parity_many_seeds():
    """Both kernels (G1 + G4) vs the jnp oracle across random scenes."""
    from cython3dmodelrenderer_tpu.ops import binning
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    for seed, size in [(11, (64, 128)), (12, (96, 256)), (13, (40, 130))]:
        h, w = size
        config = RenderConfig(height=h, width=w, fov=70)
        tris, colors, normals = random_scene(t=80, seed=seed)
        tv, tn, tc = (jnp.asarray(tris), jnp.asarray(normals),
                      jnp.asarray(colors))
        degenerate, backfacing = visibility_masks(tv, tn)
        active = ~degenerate & ~backfacing
        ts = project_to_screen(tv, config)
        bbox = raster_ref.required_bbox_size(ts, active, config)
        ref = raster_ref.rasterize(ts, tc, tn, active, config,
                                   bbox_size=bbox, chunk=16)
        rows, tx0, cx, ty0, cy, counts, total = rp._stage_a(
            ts, tc, tn, active, config, 8, 128)
        for group in (1, 4):
            if group == 1:
                p_cap = binning.capacity_bucket(int(total), 128)
            else:
                p_cap = binning.capacity_bucket(
                    int(rp.grouped_slot_total(ts, active, config, tile_h=8,
                                              tile_w=128, group=group)), 128)
            pal, _na, _u, _pi = rp._stage_b_jit(
                rows, tx0, cx, ty0, cy, counts, config=config, p_cap=p_cap,
                grid_cap=0, tile_h=8, tile_w=128, chunk=128, interpret=True,
                group=group)
            assert_match(ref, pal, edge_tol=1e-3)


class _ArrayModel:
    """Minimal model stand-in: precomputed per-triangle device arrays."""

    def __init__(self, tv, tn, tc):
        self.vertices_by_triangles = jnp.asarray(tv)
        self.normals_by_triangles = jnp.asarray(tn)
        self.colors_by_triangles = jnp.asarray(tc)


def test_overflow_auto_recovery():
    """A growing scene never yields a truncated frame: on bin-capacity
    overflow the filler grows its bucket and transparently re-renders
    before the frame is observable through the getters."""
    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

    t = 768
    tris, colors, _ = random_scene(t=t, seed=11)
    tris[..., 2] = 1.0 + 0.01 * tris[..., 2]
    # all front-facing so none get culled — the test needs high slot demand
    normals = np.full((t, 3, 3), [0.0, 0.0, -1.0], np.float32)
    ctr = tris.mean(axis=1, keepdims=True)
    small = ctr + (tris - ctr) * np.array([0.1, 0.1, 1.0], np.float32)
    # huge triangles around on-screen centers: every triangle covers every
    # tile, so slot demand is ~t per tile and overflows the small bucket
    big = ctr + (tris - ctr) * np.array([12.0, 12.0, 1.0], np.float32)

    filler = AdvancedPixelBufferFiller(64, 64, fov=60, backend="pallas",
                                       interpret=True)
    filler.render_model(_ArrayModel(small, normals, colors))
    cap_before = filler._p_cap
    # same triangle count -> the capacity bucket is kept; the big scene's
    # slot demand must overflow it for the test to mean anything
    filler.render_model(_ArrayModel(big, normals, colors))
    assert not filler.validate_capacity(), "scene did not overflow the bucket"
    got = np.asarray(filler.get_color_buffer())   # repaired frame
    gotz = np.asarray(filler.get_z_buffer())
    assert filler._p_cap > cap_before

    fresh = AdvancedPixelBufferFiller(64, 64, fov=60, backend="pallas",
                                      interpret=True)
    fresh.render_model(_ArrayModel(big, normals, colors))
    np.testing.assert_array_equal(got, np.asarray(fresh.get_color_buffer()))
    np.testing.assert_array_equal(gotz, np.asarray(fresh.get_z_buffer()))


def test_frame_provisional_signal():
    """``frame_provisional`` tells callers whether the frame the getters
    just served is still awaiting its completeness verdict: True right
    after a dispatch, False once the background reader processed the
    demand cleanly (bounded wait — the reader is asynchronous) or after
    ``snapshot_buffers(strict=True)`` / ``validate_capacity()``."""
    import time

    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

    tris, colors, _ = random_scene(t=64, seed=7)
    tris[..., 2] = 1.0 + 0.01 * tris[..., 2]
    normals = np.full((64, 3, 3), [0.0, 0.0, -1.0], np.float32)
    filler = AdvancedPixelBufferFiller(64, 64, fov=60, backend="pallas",
                                       interpret=True)
    assert filler.frame_provisional is False      # nothing dispatched yet
    filler.render_model(_ArrayModel(tris, normals, colors))
    # lazily decays to False once the reader confirms the frame fit
    deadline = time.monotonic() + 60.0
    while filler.frame_provisional and time.monotonic() < deadline:
        time.sleep(0.02)
        filler.get_color_buffer()                 # getters drain reports
    assert filler.frame_provisional is False

    # strict snapshot resolves immediately (and consistently)
    filler.render_model(_ArrayModel(tris, normals, colors))
    snap = filler.snapshot_buffers(strict=True)
    assert filler.frame_provisional is False
    assert len(snap) == 4


def test_overflow_lazy_drain_repairs_growing_sweep():
    """Without explicit validate_capacity() calls, the background demand
    reader must detect a mid-sweep overflow and the lazy getter drain must
    repair — the buffers CONVERGE to an amply-sized fresh render within a
    bounded wait (the reader runs asynchronously; a strict sync would cost
    ~30 ms/frame of tunnel latency in production)."""
    import time

    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

    t = 768
    tris, colors, _ = random_scene(t=t, seed=13)
    tris[..., 2] = 1.0 + 0.01 * tris[..., 2]
    normals = np.full((t, 3, 3), [0.0, 0.0, -1.0], np.float32)
    ctr = tris.mean(axis=1, keepdims=True)

    filler = AdvancedPixelBufferFiller(64, 64, fov=60, backend="pallas",
                                      interpret=True)
    scales = [0.1, 0.1, 12.0, 12.0, 12.0, 12.0, 12.0]
    for s in scales:
        scene = ctr + (tris - ctr) * np.array([s, s, 1.0], np.float32)
        filler.render_model(_ArrayModel(scene, normals, colors))

    fresh = AdvancedPixelBufferFiller(64, 64, fov=60, backend="pallas",
                                      interpret=True)
    big = ctr + (tris - ctr) * np.array([12.0, 12.0, 1.0], np.float32)
    fresh.render_model(_ArrayModel(big, normals, colors))
    want = np.asarray(fresh.get_color_buffer())

    deadline = time.monotonic() + 60.0
    got = np.asarray(filler.get_color_buffer())
    while not np.array_equal(got, want) and time.monotonic() < deadline:
        time.sleep(0.05)
        got = np.asarray(filler.get_color_buffer())
    np.testing.assert_array_equal(got, want)


def test_demand_reader_failed_read_is_not_a_clean_verdict():
    """A demand scalar whose host read RAISES (transient device/tunnel
    error) must not be recorded as 'frame confirmed complete' — after
    bounded retries the reader reports the frame as overflowing so the
    filler conservatively re-renders instead of serving a possibly
    truncated frame as validated (review finding, round 3)."""
    from cython3dmodelrenderer_tpu.fillers import _DemandReader

    class _Boom:
        def __int__(self):
            raise RuntimeError("transient read failure")

    reader = _DemandReader()
    try:
        reader.put(_Boom(), 100, 0, 0, seq=1)
        reader.q.join()                     # waits through the retries too
        demand, tiles, seq_done = reader.take()
        assert seq_done == 1                # the item WAS processed...
        assert demand == 101                # ...with a conservative verdict
        assert tiles == 0                   # compaction off → never flagged

        reader.put(7, 100, 0, 0, seq=2)     # and a clean read stays clean
        reader.q.join()
        demand, tiles, seq_done = reader.take()
        assert (demand, tiles, seq_done) == (0, 0, 2)

        # a failed read with live-group compaction ON flags BOTH capacities
        reader.put(_Boom(), 100, _Boom(), 64, seq=3)
        reader.q.join()
        demand, tiles, seq_done = reader.take()
        assert (demand, tiles, seq_done) == (101, 65, 3)
    finally:
        reader.stop()


def test_binsort_grouped_overflow_clamps_and_unroll_tail():
    """Direct bin_sort_grouped hardening: with an undersized slot_cap the
    placement must stay in bounds (clamped group layout, no neighbor
    stomping), and pair counts not divisible by the unroll factor must not
    let the overrun emits corrupt the order (sentinel-tile tail)."""
    import jax.numpy as jnp
    import numpy as np

    from cython3dmodelrenderer_tpu.ops.binsort_pallas import (
        bin_sort_grouped, group_histogram)

    rng = np.random.RandomState(3)
    t = 37                                  # odd count → unroll-8 tail
    ntx, nty, group, sub = 4, 8, 4, 32
    tx0 = jnp.asarray(rng.randint(0, ntx, t), jnp.int32)
    ty0 = jnp.asarray(rng.randint(0, nty, t), jnp.int32)
    cx = jnp.asarray(np.minimum(rng.randint(1, 4, t), ntx - np.asarray(tx0)),
                     jnp.int32)
    cy = jnp.asarray(np.minimum(rng.randint(1, 4, t), nty - np.asarray(ty0)),
                     jnp.int32)

    ample = 128 * int(jnp.sum(group_histogram(
        tx0, cx, ty0, cy, ntx, nty, group, sub)[3]))
    for slot_cap in (ample, 128):           # ample and badly undersized
        order, gstarts, gchunks, stids, sstripes, tile_counts, total, \
            n_active = bin_sort_grouped(tx0, cx, ty0, cy, ntx=ntx, nty=nty,
                                        slot_cap=slot_cap, group=group,
                                        sub=sub, interpret=True)
        order = np.asarray(order)
        gstarts = np.asarray(gstarts)
        assert order.shape == (slot_cap,)
        # clip contract: placed slots hold real triangle ids, unplaced
        # slots clamp into [0, t]
        assert order.min() >= 0 and order.max() <= t
        assert gstarts[-1] <= slot_cap      # clamped chunk layout
        assert np.all(np.asarray(gchunks) >= 0)

    # ample capacity: every (triangle, tile) pair must be placed exactly
    # once in its tile's stripe slots (count-sorted composition: tile at
    # sorted position k lives in group k//group, stripe k%group), in
    # ascending triangle order under the STRIDED lane-class layout (stripe
    # s owns lanes {s, s+group, ...}; class-lane m holds the contiguous
    # rank block [m*B, (m+1)*B), B = group chunks)
    order, gstarts, gchunks, stids, sstripes, tile_counts, total, _ = \
        bin_sort_grouped(tx0, cx, ty0, cy, ntx=ntx, nty=nty, slot_cap=ample,
                         group=group, sub=sub, interpret=True)
    order, gstarts, tile_counts, stids, sstripes = map(
        np.asarray, (order, gstarts, tile_counts, stids, sstripes))
    # stids is a permutation of the real tiles
    sortpos = np.empty(ntx * nty, np.int64)
    sortpos[stids] = np.arange(ntx * nty)
    assert np.array_equal(stids[sortpos], np.arange(ntx * nty))
    tx0n, ty0n, cxn, cyn = map(np.asarray, (tx0, ty0, cx, cy))
    for tile in range(ntx * nty):
        tyv, txv = divmod(tile, ntx)
        want = [tri for tri in range(t)
                if (tx0n[tri] <= txv < tx0n[tri] + cxn[tri]
                    and ty0n[tri] <= tyv < ty0n[tri] + cyn[tri])]
        k = sortpos[tile]
        base = gstarts[k // group] + (k % group)
        b = max(int((gstarts[k // group + 1] - gstarts[k // group])
                    // (group * sub)), 1)
        got = [order[base + (r % b) * (group * sub) + (r // b) * group]
               for r in range(tile_counts[tile])]
        assert got == want, f"tile {tile}: {got} != {want}"
    # count-sorted composition: group chunk demand must equal its largest
    # member tile's stripe demand (balanced stripes, no max-over-neighbors)
    stripes = -(-tile_counts // sub)
    sorted_stripes = stripes[stids[stids < ntx * nty]]
    assert np.all(np.diff(sorted_stripes) <= 0)      # descending
    np.testing.assert_array_equal(np.asarray(gchunks),
                                  sorted_stripes[::group])


def test_fast_shade_mode():
    """Opt-in fast-shade (Gouraud) mode vs the exact default path.

    Contract: (a) the z-buffer is BIT-IDENTICAL to the exact mode (same
    geometry planes decide winners), (b) the shaded image equals the jnp
    oracle run on per-vertex-shaded colors (classic Gouraud semantics),
    (c) the default path is untouched — a filler without ``fast_shade``
    dispatches the exact 6-channel mode.
    """
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.config import RenderConfig
    from cython3dmodelrenderer_tpu.ops import binning
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    config = RenderConfig(height=96, width=128, fov=60)
    tris, colors, normals = random_scene(t=60, seed=9)
    tv, tn, tc = jnp.asarray(tris), jnp.asarray(normals), jnp.asarray(colors)
    light = -jnp.asarray([0.3, -0.2, 1.0], jnp.float32)
    light = light / jnp.linalg.norm(light)

    degenerate, backfacing = visibility_masks(tv, tn)
    active = ~degenerate & ~backfacing
    ts = project_to_screen(tv, config)
    slots = int(rp.grouped_slot_total(ts, active, config, group=4))
    p_cap = binning.capacity_bucket(slots, 128)

    exact = rp.render_frame(tv, tn, tc, config, p_cap, 0, group=4,
                            interpret=True, post="lambert_u8", light=light)
    fast = rp.render_frame(tv, tn, tc, config, p_cap, 0, group=4,
                           interpret=True, post="fast_lambert_u8",
                           light=light)
    (c_e, z_e, n_e), _, _, img_e = exact
    (c_f, z_f, n_f), _, _, img_f = fast

    # (a) bit-identical depth
    np.testing.assert_array_equal(np.asarray(z_f), np.asarray(z_e))
    # fast mode's normal G-buffer is documented zeros
    assert float(jnp.abs(n_f).max()) == 0.0

    # (b) Gouraud semantics: oracle on pre-shaded colors
    dot = jnp.sum(tn * light, axis=-1, keepdims=True)
    norm = jnp.linalg.norm(tn, axis=-1, keepdims=True)
    shade = jnp.clip(dot / (norm + 1e-6), 0.0, 1.0)
    bbox = raster_ref.required_bbox_size(ts, active, config)
    ref = raster_ref.rasterize(ts, tc * shade, tn, active, config,
                               bbox_size=bbox, chunk=16)
    frac = (np.abs(np.asarray(ref[0]) - np.asarray(c_f)).max(axis=-1)
            > 0.5).mean()
    assert frac == 0.0, f"fast-shade color mismatch fraction {frac}"

    # (c) default path: a plain filler never rewrites the post mode
    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

    filler = AdvancedPixelBufferFiller(96, 128, fov=60, backend="pallas",
                                       interpret=True)
    assert filler.fast_shade is False
    filler._rasterize(tv, tn, tc, post="lambert_u8", light=light)
    assert filler._post_mode[0] == "lambert_u8"
    np.testing.assert_array_equal(np.asarray(filler._post_image),
                                  np.asarray(img_e))
    # and the opt-in flag engages the fast mode
    filler_f = AdvancedPixelBufferFiller(96, 128, fov=60, backend="pallas",
                                         interpret=True, fast_shade=True)
    filler_f._rasterize(tv, tn, tc, post="lambert_u8", light=light)
    assert filler_f._post_mode[0] == "fast_lambert_u8"
    np.testing.assert_array_equal(np.asarray(filler_f._post_image),
                                  np.asarray(img_f))


def test_sign_cover_fold():
    """Opt-in sign-bit coverage fold (``sign_cover=True``).

    Contract: (a) grouped and un-grouped kernels stay bit-identical to
    each other under the flag, (b) the result differs from the exact
    default only at exactly-on-edge pixels (tiny mismatch fraction),
    (c) the default path is untouched — ``sign_cover=False`` renders
    bit-identically to a build without the flag (same code path), and the
    filler default is off.
    """
    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller
    from cython3dmodelrenderer_tpu.ops import binning
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    config = RenderConfig(height=96, width=128, fov=60)
    tris, colors, normals = random_scene(t=80, seed=21)
    tv, tn, tc = jnp.asarray(tris), jnp.asarray(normals), jnp.asarray(colors)
    degenerate, backfacing = visibility_masks(tv, tn)
    active = ~degenerate & ~backfacing
    ts = project_to_screen(tv, config)
    rows, tx0, cx, ty0, cy, counts, total = rp._stage_a(
        ts, tc, tn, active, config, 8, 128)

    outs = {}
    for group in (1, 4):
        if group == 1:
            p_cap = binning.capacity_bucket(int(total), 128)
        else:
            p_cap = binning.capacity_bucket(
                int(rp.grouped_slot_total(ts, active, config, tile_h=8,
                                          tile_w=128, group=group)), 128)
        for sc in (False, True):
            outs[(group, sc)], _na, _u, _pi = rp._stage_b_jit(
                rows, tx0, cx, ty0, cy, counts, config=config, p_cap=p_cap,
                grid_cap=0, tile_h=8, tile_w=128, chunk=128, interpret=True,
                group=group, sign_cover=sc)

    # (a) grouped == un-grouped bit-for-bit under the flag
    for a, b in zip(outs[(1, True)], outs[(4, True)]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # (b) vs exact: only edge pixels may flip
    z_exact = np.asarray(outs[(1, False)][1])
    z_fold = np.asarray(outs[(1, True)][1])
    frac = (np.abs(z_exact - z_fold).max(axis=-1) > 1e-5).mean()
    assert frac <= 1e-3, f"sign_cover flipped {frac:.2%} of pixels"
    # (c) filler default is exact
    filler = AdvancedPixelBufferFiller(96, 128, fov=60, backend="pallas",
                                       interpret=True)
    assert filler.sign_cover is False


def test_grouped_degrades_past_packing_limits():
    """A workload past the packed grouped binner's bit budgets (here: more
    than 2^17 triangles) must render through the un-grouped fallback
    instead of tripping an assert — overflow auto-recovery can reach such
    shapes on its own by growing the capacity bucket."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.ops import binning
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp
    from cython3dmodelrenderer_tpu.ops.binsort_pallas import grouped_limits_ok

    config = RenderConfig(height=64, width=64, fov=60)
    t_small = 24
    tris, colors, normals = random_scene(t=t_small, seed=11)
    # pad to 2^17 triangles with degenerate (zero-area -> culled) geometry
    t_big = (1 << 17) + 64
    pad = t_big - t_small
    tris_b = np.concatenate(
        [tris, np.zeros((pad, 3, 3), np.float32) + [0.0, 0.0, 1.0]])
    colors_b = np.concatenate([colors, np.zeros((pad, 3, 3), np.float32)])
    normals_b = np.concatenate(
        [normals, np.tile(np.float32([0, 0, -1]), (pad, 3, 1))])

    tv, tn, tc = (jnp.asarray(tris_b), jnp.asarray(normals_b),
                  jnp.asarray(colors_b))
    degenerate, backfacing = visibility_masks(tv, tn)
    active = ~degenerate & ~backfacing
    ts = project_to_screen(tv, config)
    rows, tx0, cx, ty0, cy, counts, total = rp._stage_a(
        ts, tc, tn, active, config, 8, 64)
    p_cap = binning.capacity_bucket(int(total), 128)
    assert not grouped_limits_ok(t_big, p_cap, 1, 8)   # t over budget

    pal, _na, _used, _pi = rp._stage_b_jit(
        rows, tx0, cx, ty0, cy, counts, config=config, p_cap=p_cap,
        grid_cap=0, tile_h=8, tile_w=64, chunk=128, interpret=True, group=4)

    ref_ts = project_to_screen(jnp.asarray(tris), config)
    deg_s, bf_s = visibility_masks(jnp.asarray(tris), jnp.asarray(normals))
    bbox = raster_ref.required_bbox_size(ref_ts, ~deg_s & ~bf_s, config)
    ref = raster_ref.rasterize(ref_ts, jnp.asarray(colors),
                               jnp.asarray(normals), ~deg_s & ~bf_s, config,
                               bbox_size=bbox, chunk=16)
    # 3e-3: this seed has 8 triangle-edge pixels where plane-form λ rounds
    # differently from the oracle's ratio form on CPU (2 on TPU)
    assert_match(ref, pal, edge_tol=3e-3)


def test_sorted_gather_binning_matches_scalar_placement():
    """The bitonic sorted-gather binning (bin_gather_grouped) must produce
    the same group tables and bit-identical rendered G-buffers as the
    scalar counting-sort placement path (bin_sort_grouped + gather)."""
    from cython3dmodelrenderer_tpu.ops import binning, binsort_pallas
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    rng = np.random.RandomState(7)
    t = 300
    config = RenderConfig(height=128, width=128, fov=60)
    th, tw = 16, 32
    group, sub, chunk = 8, 16, 128
    ntx, nty_g = 4, 8

    pts = rng.rand(t, 3, 2) * 140 - 6
    z = rng.rand(t, 3, 1) * 0.9 + 0.05
    ts = jnp.asarray(np.concatenate([pts, z], -1).astype(np.float32))
    tc = jnp.asarray(rng.rand(t, 3, 3).astype(np.float32) * 255)
    tn = jnp.asarray(rng.rand(t, 3, 3).astype(np.float32) - 0.5)
    act = jnp.asarray(rng.rand(t) > 0.1)

    rows, tx0, cx, ty0, cy, counts = binning.plane_data(
        ts, act, config, th, tw, colors=tc, normals=tn)
    p_cap = binning.capacity_bucket(int(jnp.sum(counts)), 128)
    ru = rp._ROWS_USED

    (order, gstarts, gchunks, stids, sstripes, _tc, tot, na) = \
        binsort_pallas.bin_sort_grouped(tx0, cx, ty0, cy, ntx=ntx,
                                        nty=nty_g, slot_cap=p_cap,
                                        group=group, sub=sub, interpret=True)
    binned_old = binning.gather_binned(rows[:, :ru], order, chunk)
    (binned_new, gstarts2, gchunks2, stids2, sstripes2, _tc2, tot2, na2) = \
        binsort_pallas.bin_gather_grouped(rows[:, :ru], tx0, cx, ty0, cy,
                                          ntx=ntx, nty=nty_g, slot_cap=p_cap,
                                          group=group, sub=sub,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(gstarts), np.asarray(gstarts2))
    np.testing.assert_array_equal(np.asarray(gchunks), np.asarray(gchunks2))
    np.testing.assert_array_equal(np.asarray(stids), np.asarray(stids2))
    np.testing.assert_array_equal(np.asarray(sstripes), np.asarray(sstripes2))
    assert int(tot) == int(tot2) and int(na) == int(na2)

    chans_old, _u8o = rp._raster_tiles_grouped(
        binned_old, gstarts, gchunks, stids, sstripes, ntx, nty_g,
        th, tw, chunk, group, config.z_init, True)
    chans_new, _u8n = rp._raster_tiles_grouped(
        binned_new, gstarts2, gchunks2, stids2, sstripes2, ntx, nty_g,
        th, tw, chunk, group, config.z_init, True)
    np.testing.assert_array_equal(np.asarray(chans_old),
                                  np.asarray(chans_new))


def _check_lane_block_layout(rng, ntx, nty, group, sub, t):
    """Validate bin_gather_grouped's interleaved slot layout against an
    independent numpy reconstruction of the STRIDED lane-class rank rule:
    slot (chunk j of group g, lane l) must hold stripe ``l % group``'s pair
    of rank ``(l // group) * B + j`` (B = the group's chunk count), pairs
    per tile enumerated in triangle order.
    """
    from cython3dmodelrenderer_tpu.ops import binsort_pallas

    n_tiles = ntx * nty
    tx0 = rng.randint(0, ntx, size=t).astype(np.int32)
    ty0 = rng.randint(0, nty, size=t).astype(np.int32)
    cx = np.minimum(rng.randint(1, 4, size=t), ntx - tx0).astype(np.int32)
    cy = np.minimum(rng.randint(1, 3, size=t), nty - ty0).astype(np.int32)
    cx[rng.rand(t) < 0.1] = 0                        # some inactive
    rows = rng.rand(t, 8).astype(np.float32)

    # generous capacity: one chunk per (tile, stripe-demand) is enough here
    _tc, _st, _ss, gchunks = binsort_pallas.group_histogram(
        jnp.asarray(tx0), jnp.asarray(cx), jnp.asarray(ty0), jnp.asarray(cy),
        ntx, nty, group, sub)
    slot_cap = max(128, 128 * int(jnp.sum(gchunks)))
    assert slot_cap < (1 << 17)

    (binned, gstarts, gchunks, stids, _sstripes, _tcounts, total, _na) = \
        binsort_pallas.bin_gather_grouped(
            jnp.asarray(rows), jnp.asarray(tx0), jnp.asarray(cx),
            jnp.asarray(ty0), jnp.asarray(cy), ntx=ntx, nty=nty,
            slot_cap=slot_cap, group=group, sub=sub, interpret=True)
    assert int(total) <= slot_cap                    # nothing clamped
    binned = np.asarray(binned)
    gstarts = np.asarray(gstarts)
    gchunks_np = np.asarray(gchunks)
    stids = np.asarray(stids)

    per_tile = [[] for _ in range(n_tiles)]
    for i in range(t):
        for dy in range(cy[i]):
            for dx in range(cx[i]):
                per_tile[(ty0[i] + dy) * ntx + (tx0[i] + dx)].append(i)

    n_checked = 0
    for g in range(len(gchunks_np)):
        b = int(gchunks_np[g])
        c0 = int(gstarts[g]) // 128
        for s in range(group):
            tid = int(stids[g * group + s])
            if tid >= n_tiles:
                continue
            plist = per_tile[tid]
            for j in range(b):
                for r_in in range(sub):
                    rank = r_in * b + j
                    if rank < len(plist):
                        slot = (c0 + j) * 128 + s + r_in * group
                        np.testing.assert_array_equal(
                            binned[slot], rows[plist[rank]])
                        n_checked += 1
    assert n_checked > 0


def test_lane_block_layout_small_grid():
    """Packed single-word chunk-table branch (n_groups <= 2048)."""
    _check_lane_block_layout(np.random.RandomState(3), ntx=6, nty=8,
                             group=8, sub=16, t=200)
    _check_lane_block_layout(np.random.RandomState(4), ntx=5, nty=7,
                             group=4, sub=32, t=120)


def test_lane_block_layout_many_groups():
    """The two-word chunk-table branch: group < 8 with a big tile grid
    pushes n_groups past 2048, where the old single packed word's
    ``gi << 20`` wrapped negative and silently corrupted every trailing
    chunk's group id (review finding, round 3)."""
    # 63 x 66 tiles, group=2 -> 2079 groups > 2048
    _check_lane_block_layout(np.random.RandomState(5), ntx=63, nty=66,
                             group=2, sub=64, t=60)


def test_grouped_slot_total_degrades_with_stage_b():
    """Sizing must mirror _stage_b's degrade decision: an image wider than
    63 tiles falls back to the un-grouped path, so grouped_slot_total must
    return the raw pair total instead of corrupting group_histogram's
    packed 14-bit tile-sort key (review finding, round 3)."""
    from cython3dmodelrenderer_tpu.ops import binning
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    config = RenderConfig(height=64, width=64 * 33, fov=60)   # ntx = 66 > 63
    rng = np.random.RandomState(11)
    t = 40
    pts = rng.rand(t, 3, 2).astype(np.float32) * 200
    z = rng.rand(t, 3, 1).astype(np.float32) * 0.9 + 0.05
    ts = jnp.asarray(np.concatenate([pts, z], -1))
    active = jnp.ones((t,), bool)

    total = int(rp.grouped_slot_total(ts, active, config))
    _rows, _tx0, _cx, _ty0, _cy, counts = binning.plane_data(
        ts, active, config, rp.TILE_H, rp.TILE_W)
    assert total == int(jnp.sum(counts))


def test_packed_out_parity():
    """``packed_out=True`` + ``unpack_gbuffers`` must be BIT-identical to
    the eager planar return, and the fused post image must not change —
    the packed stripe buffer IS the G-buffer data, unpacked lazily."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp
    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

    config = RenderConfig(height=96, width=128, fov=60)
    tris, colors, normals = random_scene(t=80, seed=7)
    tv, tn, tc = jnp.asarray(tris), jnp.asarray(normals), jnp.asarray(colors)
    light = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)

    for group in (1, rp.GROUP):
        eager = rp.render_frame(tv, tn, tc, config, 4096, 0, group=group,
                                interpret=True, post="lambert_u8",
                                light=light)
        packed = rp.render_frame(tv, tn, tc, config, 4096, 0, group=group,
                                 interpret=True, post="lambert_u8",
                                 light=light, packed_out=True)
        (c_e, z_e, n_e), _u, _na, img_e = eager
        pk, _u2, _na2, img_p = packed
        np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_e))
        c_p, z_p, n_p = rp.unpack_gbuffers(pk, config)
        np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_e))
        np.testing.assert_array_equal(np.asarray(z_p), np.asarray(z_e))
        np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_e))

    # filler level: the lazy getters serve the same buffers the eager
    # compat wrapper returns
    filler = AdvancedPixelBufferFiller(96, 128, fov=60, backend="pallas",
                                       interpret=True)
    filler.render_arrays(tv, tn, tc, post="u8")
    assert filler._packed is not None          # still lazy
    img_lazy = np.asarray(filler._post_image)
    c = np.asarray(filler.get_color_buffer())  # materializes
    assert filler._packed is None
    filler2 = AdvancedPixelBufferFiller(96, 128, fov=60, backend="pallas",
                                        interpret=True)
    c2, z2, n2 = filler2._rasterize(tv, tn, tc, post="u8")
    np.testing.assert_array_equal(c, np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(filler.get_z_buffer()),
                                  np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(filler.get_normals_buffer()),
                                  np.asarray(n2))
    np.testing.assert_array_equal(img_lazy, np.asarray(filler2._post_image))


def test_trivial_reject_bit_exact_and_smaller():
    """Per-pair edge trivial-reject must not change a single pixel, only
    shrink the surviving pair set (thin/diagonal triangles over-bin their
    bbox rectangle; the kernel re-tests coverage per pixel, so dropping
    provably-uncovered pairs is invisible)."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.ops import binning, binsort_pallas
    from cython3dmodelrenderer_tpu.ops import raster_pallas as rp

    rng = np.random.RandomState(11)
    config = RenderConfig(height=128, width=128, fov=60)
    th, tw = 16, 32
    group, sub, chunk = 8, 16, 128
    ntx, nty_g = 4, 8
    t = 200
    # long thin diagonal triangles: worst-case rectangle over-binning
    base = rng.rand(t, 1, 2) * 140 - 6
    d = rng.randn(t, 1, 2) * 60
    thin = rng.randn(t, 1, 2) * 2.5
    pts = np.concatenate([base, base + d, base + d * 0.5 + thin], axis=1)
    z = rng.rand(t, 3, 1) * 0.9 + 0.05
    ts = jnp.asarray(np.concatenate([pts, z], -1).astype(np.float32))
    tc = jnp.asarray(rng.rand(t, 3, 3).astype(np.float32) * 255)
    tn = jnp.asarray(rng.rand(t, 3, 3).astype(np.float32) - 0.5)
    act = jnp.asarray(rng.rand(t) > 0.1)

    rows, tx0, cx, ty0, cy, counts = binning.plane_data(
        ts, act, config, th, tw, colors=tc, normals=tn)
    p_cap = binning.capacity_bucket(int(jnp.sum(counts)), 128)
    ru = rp._ROWS_USED

    outs = {}
    slots = {}
    for name, kw in [("off", {}), ("on", {"tile_h": th, "tile_w": tw})]:
        (binned, gstarts, gchunks, stids, sstripes, _tc2, tot, _na) = \
            binsort_pallas.bin_gather_grouped(
                rows[:, :ru], tx0, cx, ty0, cy, ntx=ntx, nty=nty_g,
                slot_cap=p_cap, group=group, sub=sub, interpret=True, **kw)
        slots[name] = int(tot)
        gpacked, _u8 = rp._raster_tiles_grouped(
            binned, gstarts, gchunks, stids, sstripes, ntx, nty_g,
            th, tw, chunk, group, config.z_init, True)
        outs[name] = rp._gbuffers_from_grouped(
            gpacked, stids, config, th, tw, binning.N_ATTRS, group)
    assert slots["on"] <= slots["off"]
    for a, b in zip(outs["off"], outs["on"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # thin-triangle scenes must actually reject something
    assert slots["on"] < slots["off"]


def test_deferred_gbuffer_rerender_matches_eager():
    """Hot post-mode frames skip the f32 G-buffer output (emit_gbuf=False);
    a getter re-renders the retained inputs — the result must BIT-match a
    keep_gbuffers=True dispatch of the same frame (deterministic kernel)."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.fillers import (_DEFERRED,
                                                   AdvancedPixelBufferFiller)

    config_hw = (96, 128)
    tris, colors, normals = random_scene(t=60, seed=13)
    tv, tn, tc = jnp.asarray(tris), jnp.asarray(normals), jnp.asarray(colors)

    hot = AdvancedPixelBufferFiller(*config_hw, fov=60, backend="pallas",
                                    interpret=True)
    hot.render_arrays(tv, tn, tc, post="u8")
    assert hot._packed is _DEFERRED          # f32 output really skipped
    img_hot = np.asarray(hot._post_image)
    c_hot = np.asarray(hot.get_color_buffer())   # triggers the re-render
    z_hot = np.asarray(hot.get_z_buffer())
    n_hot = np.asarray(hot.get_normals_buffer())

    eager = AdvancedPixelBufferFiller(*config_hw, fov=60, backend="pallas",
                                      interpret=True)
    eager.render_arrays(tv, tn, tc, post="u8", keep_gbuffers=True)
    assert eager._packed is not _DEFERRED
    np.testing.assert_array_equal(img_hot, np.asarray(eager._post_image))
    np.testing.assert_array_equal(c_hot, np.asarray(eager.get_color_buffer()))
    np.testing.assert_array_equal(z_hot, np.asarray(eager.get_z_buffer()))
    np.testing.assert_array_equal(n_hot,
                                  np.asarray(eager.get_normals_buffer()))


def test_live_group_compaction_bit_exact_and_repairs():
    """LIVE-GROUP GRID COMPACTION (render_frame ``g_cap``): a compacted
    frame must be BIT-identical to the full-grid frame (count-sorted
    composition makes nonempty groups a prefix — tiles past the cap are
    pure background), and a filler whose scene grows past its live-group
    bucket must detect the tile-count overflow and repair by re-rendering
    at a grown cap."""
    import jax.numpy as jnp

    from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

    config = RenderConfig(height=256, width=256, fov=90)
    # a small triangle covering a few tiles of the 16x8 tile grid
    tv = jnp.asarray(np.array(
        [[[-0.2, -0.2, 1.0], [0.2, -0.2, 1.0], [0.0, 0.25, 1.0]]],
        np.float32))
    tn = jnp.asarray(np.tile(np.array([0, 0, -1], np.float32), (1, 3, 1)))
    tc = jnp.asarray(np.full((1, 3, 3), 200, np.float32))

    full = raster_pallas.render_frame(tv, tn, tc, config, 2048, 0, group=16,
                                      interpret=True, post="u8",
                                      packed_out=True, emit_gbuf=True,
                                      g_cap=0)
    comp = raster_pallas.render_frame(tv, tn, tc, config, 2048, 0, group=16,
                                      interpret=True, post="u8",
                                      packed_out=True, emit_gbuf=True,
                                      g_cap=2)
    np.testing.assert_array_equal(np.asarray(full[-1]), np.asarray(comp[-1]))
    for a, b in zip(raster_pallas.unpack_gbuffers(full[0], config),
                    raster_pallas.unpack_gbuffers(comp[0], config)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the compacted output really is smaller than the full grid's
    assert comp[0][0].shape[0] == 2 < full[0][0].shape[0]

    # filler: size on the small scene, then grow coverage past the bucket
    f = AdvancedPixelBufferFiller(256, 256, fov=90, backend="pallas",
                                  interpret=True)
    f.render_arrays(tv, tn, tc, post="u8")
    small_cap = f._g_cap
    assert small_cap > 0
    # an 8x scaled triangle covers most of the image -> many more tiles
    f.render_arrays(tv * jnp.asarray([8.0, 8.0, 1.0]), tn, tc, post="u8")
    assert f.validate_capacity() is False    # overflow detected + repaired
    assert f._g_cap > small_cap
    # repaired frame == fresh render at ample caps
    ref = AdvancedPixelBufferFiller(256, 256, fov=90, backend="pallas",
                                    interpret=True)
    ref.render_arrays(tv * jnp.asarray([8.0, 8.0, 1.0]), tn, tc, post="u8")
    ref.validate_capacity()
    np.testing.assert_array_equal(np.asarray(f.get_post_image()),
                                  np.asarray(ref.get_post_image()))
