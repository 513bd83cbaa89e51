"""Pixel-buffer fillers: the rasterization backends behind the Renderer.

Mirrors the reference's filler hierarchy
(``crender/{py,cy}/pixel_buffer_filler/``):

* ``PixelBufferFiller`` — abstract per-triangle interface
  (``pixel_buffer_filler.py:7-11``);
* ``AdvancedPixelBufferFiller`` — the full z-buffered rasterizer. Like the
  compiled reference (Version C, ``advanced_pixel_buffer_filler.pyx:92``) it
  renders the *whole model* in one call (``render_model``) and owns persistent
  device G-buffers; a per-triangle ``compute_triangle_statistics`` compat path
  matches the pure-python reference filler
  (``py/advanced_pixel_buffer_filler.py:39``);
* ``EdgeOnlyPixelBufferFiller`` — wireframe (see ``ops/wireframe.py``).

Backend selection: ``backend="jnp"`` uses the XLA scatter-min rasterizer
(``ops/raster_ref.py``); ``backend="pallas"`` uses the tile-binned Pallas
kernel (``ops/raster_pallas.py``); ``"auto"`` picks pallas on TPU.
"""
from __future__ import annotations

import atexit
import queue
import threading
import time
import weakref
from abc import abstractmethod
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig
from .models.buffer import Buffer
from .ops import raster_ref

# sentinel: a hot post-mode frame whose f32 G-buffer output was skipped
# (emit_gbuf=False); getters re-render the retained inputs on demand
_DEFERRED = object()
from .ops.projection import project_to_screen, visibility_masks


class PixelBufferFiller:
    @abstractmethod
    def compute_triangle_statistics(self, triangle, colors, normals,
                                    color_buffer: Buffer, z_buffer: Buffer,
                                    n_buffer: Buffer):
        ...


@partial(jax.jit, static_argnames=("config",))
def _geometry_stage(tri_verts, tri_norms, config: RenderConfig):
    """Batched projection + culling masks (one MXU matmul for the model)."""
    degenerate, backfacing = visibility_masks(tri_verts, tri_norms)
    active = jnp.logical_and(~degenerate, ~backfacing)
    tris_screen = project_to_screen(tri_verts, config)
    return tris_screen, active


@partial(jax.jit, static_argnames=("config",))
def _dual_group_demand(tris_screen, active, config: RenderConfig):
    """(slots, tiles) at group=16 AND group=32 — one sizing dispatch.

    Lean frames (3 attribute channels) may pack 32 tiles per chunk; the
    filler picks the group with the smaller slot demand (see
    ``_lean_group``)."""
    from .ops import raster_pallas

    t16, a16 = raster_pallas.grouped_frame_demand(tris_screen, active,
                                                  config, group=16)
    t32, a32 = raster_pallas.grouped_frame_demand(tris_screen, active,
                                                  config, group=32)
    return t16, a16, t32, a32


class _DemandReader:
    """Background drain of per-frame bin-demand scalars.

    A blocking host read of a device scalar stalls for that frame's compute
    (and, on tunneled devices, for the whole dispatch backlog — there is no
    reliable cheap readiness signal; ``is_ready()`` was observed optimistic
    while the pipeline is busy), so the reader thread does the blocking
    ``int()`` off the dispatch thread and posts any demand that exceeded its
    frame's dispatch capacity. Owns NO reference back to its filler: the
    filler registers a ``weakref.finalize`` that posts the shutdown
    sentinel, so fillers (and their device buffers) stay collectable and
    no thread outlives its filler.
    """

    _SHUTDOWN = object()

    def __init__(self):
        self.q = queue.Queue()
        self.lock = threading.Lock()
        self.max_demand = 0   # peak overflowing demand since the last take()
        self.max_tiles = 0    # peak overflowing nonempty-tile count
        self.gen = 0          # bumps on model change; stale reports ignored
        self.seq_done = 0     # highest dispatch seq fully processed (FIFO)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        _LIVE_READERS.add(self)

    def put(self, total, cap, tiles, tile_cap, seq: int = 0) -> None:
        # called from the dispatch thread only (same thread as invalidate,
        # so the gen snapshot is consistent without the lock). ``tiles`` /
        # ``tile_cap`` monitor live-group grid compaction (tile_cap <= 0 =
        # compaction off for that dispatch — never overflows).
        self.q.put((total, cap, tiles, tile_cap, self.gen, seq, 0))

    def invalidate(self) -> None:
        with self.lock:
            self.gen += 1
            self.max_demand = 0
            self.max_tiles = 0

    def take(self):
        """Atomically (pending overflow demand, overflowing tile count,
        highest processed seq).

        One lock acquisition for all three, so a caller seeing zero demand
        with seq_done >= its newest dispatch seq knows that frame was
        processed AND found complete — the triple can't be torn by a report
        landing between separate reads.
        """
        with self.lock:
            demand, self.max_demand = self.max_demand, 0
            tiles, self.max_tiles = self.max_tiles, 0
            return demand, tiles, self.seq_done

    def stop(self) -> None:
        self.q.put(self._SHUTDOWN)

    def _loop(self) -> None:
        while True:
            item = self.q.get()
            try:
                if item is self._SHUTDOWN:
                    return
                total, cap, tiles, tile_cap, gen, seq, attempts = item
                try:
                    t = int(total)
                    a = int(tiles) if tile_cap > 0 else 0
                except Exception:
                    # A failed demand read is NOT a clean verdict. Retry a
                    # few times (transient device/tunnel hiccups), keeping
                    # the item unfinished so strict joins still wait; after
                    # that, conservatively report the frame as overflowing —
                    # one spurious repair render beats serving a possibly
                    # truncated frame as confirmed-complete.
                    if attempts + 1 < 3:
                        time.sleep(0.1 * (attempts + 1))
                        self.q.put((total, cap, tiles, tile_cap, gen, seq,
                                    attempts + 1))
                        continue
                    t, a = cap + 1, max(tile_cap, 0) + 1
                with self.lock:
                    if gen == self.gen:
                        if t > cap:
                            self.max_demand = max(self.max_demand, t)
                        if tile_cap > 0 and a > tile_cap:
                            self.max_tiles = max(self.max_tiles, a)
                    # seq is globally monotone across gens (a stale item's
                    # seq predates any newer dispatch), so unconditional
                    self.seq_done = max(self.seq_done, seq)
            finally:
                self.q.task_done()


_LIVE_READERS = weakref.WeakSet()


@atexit.register
def _drain_readers_at_exit(deadline_s: float = 30.0) -> None:
    """Let outstanding blocking PJRT scalar reads finish before interpreter
    teardown: killing a daemon thread inside one aborts the process with an
    unhandled C++ exception."""
    end = time.monotonic() + deadline_s
    for reader in list(_LIVE_READERS):
        while reader.q.unfinished_tasks and time.monotonic() < end:
            time.sleep(0.01)


class AdvancedPixelBufferFiller(PixelBufferFiller):
    """Z-buffered triangle rasterizer with persistent device G-buffers.

    Constructor signature matches the reference filler
    (``py filler:14``, ``pyx:39``); ``n_threads`` is accepted for drop-in
    compatibility but ignored — parallelism comes from the XLA/Pallas grid,
    not OpenMP threads.
    """

    def __init__(self, h: int, w: int, fov: float = 90.0, z_near: float = 0.1,
                 z_far: float = 1000.0, n_threads: Optional[int] = None,
                 backend: str = "auto", interpret: bool = False,
                 fast_shade: bool = False, sign_cover: bool = False):
        del n_threads  # reference-API compat; TPU picks its own parallelism
        self.config = RenderConfig(height=h, width=w, fov=fov, z_near=z_near,
                                   z_far=z_far, backend=backend)
        #: run Pallas kernels in interpreter mode (testing on CPU)
        self._interpret = interpret
        #: opt-in Gouraud fast path: ``post="lambert_u8"`` frames shade per
        #: VERTEX and carry 3 attribute channels instead of 6 (~25% faster
        #: frames, z-buffer bit-identical) — but the shaded image is classic
        #: Gouraud (not the reference's per-pixel-normal Lambert) and the
        #: normal G-buffer reads zeros. Default off: exact reference parity.
        self.fast_shade = fast_shade
        #: opt-in sign-bit predicate fold in the Pallas kernels (~7% less
        #: chunk-loop ALU; flips exactly-on-edge -0.0 λ pixels, so not
        #: reference-exact). Default off.
        self.sign_cover = sign_cover
        self._color = jnp.zeros((h, w, 3), jnp.float32)
        self._z = jnp.full((h, w, 1), self.config.z_init, jnp.float32)
        self._normals = jnp.zeros((h, w, 3), jnp.float32)
        # Packed-frame state: the Pallas path dispatches with
        # ``packed_out=True`` — the kernel's packed stripe buffer is the
        # G-buffer of record and the planar stacks above derive from it
        # LAZILY on first getter access (bit-exact; skipping the eager
        # unpack saves ~28 MB of planar materialization per frame on the
        # hot shaded-image path).
        self._packed = None
        self._packed_attrs = 6
        # Cached static pair-capacity bucket for the Pallas binner: lets
        # steady-state frames run with zero host syncs (overflow → retry).
        self._p_cap: Optional[int] = None
        # Cached live-group grid bucket (raster_pallas ``g_cap``): the
        # Pallas grid stops at the nonempty count-sorted groups instead of
        # covering the whole tile grid; 0 = compaction off. Sized from the
        # same sizing sync as _p_cap, grown by the same overflow loop.
        self._g_cap: int = 0
        self._sized_for: Optional[int] = None
        self._last_total = None
        self._last_active = None
        # Overflow auto-recovery: every dispatched frame's bin-slot demand
        # scalar is handed to a BACKGROUND reader thread, because a blocking
        # host read of a device scalar stalls for that frame's compute (and,
        # on tunneled devices, for the whole dispatch backlog — there is no
        # reliable cheap readiness signal there; ``is_ready()`` was observed
        # optimistic while the pipeline is busy). The reader records any
        # demand that exceeded its frame's dispatch capacity; the dispatch
        # thread checks that flag (a lock + int compare, no device traffic)
        # each render call, grows the bucket, and re-renders the newest
        # frame. validate_capacity() is the strict sync point (joins the
        # reader queue).
        self._reader = None          # _DemandReader, created on first use
        self._latest = None          # (tv, tn, tc, cap) of newest dispatch
        self._validated = True       # no un-validated dispatches outstanding
        self._dispatch_seq = 0       # monotone id per tracked dispatch
        # tiles per Pallas grid step (lane-subgroup packing); 1 = one tile
        from .ops.raster_pallas import GROUP
        self._group: int = GROUP
        self._packed_group: int = GROUP   # group of the last dispatch
        # LEAN-mode group selection: frames with 3 attribute channels
        # (lean u8 / fast-shade) may legally pack 32 tiles per chunk
        # (n_out=4, 32*4 = 128 lanes). Sparse scenes — where the per-tile
        # stripe floor dominates slot demand — measure ~30% faster at
        # group=32 (cube@1024²: 0.81 -> 0.56 ms wall), dense scenes are
        # neutral-to-worse (chunk rounding). The sizing sync evaluates slot
        # demand at BOTH groups and picks the smaller; exact-mode frames
        # (8 output planes) always use GROUP.
        self._lean_group: int = GROUP
        self._lean_caps = None            # (p_cap, g_cap) for lean frames
        # fused final-image pass of the last frame (see render_model(post=))
        self._post_mode = ("none", None)
        self._post_image: Optional[jnp.ndarray] = None

    def get_size(self) -> Tuple[int, int]:
        return self.config.height, self.config.width

    # ------------------------------------------------------------------
    # whole-model path (Version C style)
    # ------------------------------------------------------------------

    def _resolve_backend(self) -> str:
        if self.config.backend != "auto":
            return self.config.backend
        if jax.default_backend() == "tpu":
            try:
                from .ops import raster_pallas  # noqa: F401

                return "pallas"
            except ImportError:
                return "jnp"
        return "jnp"

    def render_model(self, model, order: Optional[jnp.ndarray] = None,
                     colors_override: Optional[jnp.ndarray] = None,
                     post: str = "none", light=None,
                     keep_gbuffers: bool = False) -> None:
        """Rasterize the whole model into the filler's G-buffers.

        ``order`` is an optional triangle permutation (iterator order; only
        affects depth-tie resolution). ``colors_override`` supplies (T, 3, 3)
        colors for untextured models. ``post`` ("none" | "u8" |
        "lambert_u8", with ``light``) fuses the final-image shade/quantize
        into the frame's single dispatch — read it from
        ``get_post_image()``.
        """
        tri_verts = model.vertices_by_triangles
        tri_norms = model.normals_by_triangles
        tri_colors = model.colors_by_triangles
        if tri_colors is None:
            tri_colors = colors_override
        if tri_colors is None:
            raise ValueError(
                "model has no texture colors; pass colors_override "
                "(the Renderer provides random/white fallback colors)")
        tri_colors = jnp.asarray(tri_colors, jnp.float32)

        if order is not None:
            tri_verts = tri_verts[order]
            tri_norms = tri_norms[order]
            tri_colors = tri_colors[order]

        self.render_arrays(tri_verts, tri_norms, tri_colors,
                           post=post, light=light,
                           keep_gbuffers=keep_gbuffers)

    def _rasterize(self, tri_verts, tri_norms, tri_colors,
                   post: str = "none", light=None):
        """Dispatch one frame AND materialize its planar G-buffers.

        Compatibility wrapper over ``render_arrays`` — the hot path
        (``render_arrays`` + ``get_post_image``) leaves G-buffers packed
        and lazy."""
        self.render_arrays(tri_verts, tri_norms, tri_colors,
                           post=post, light=light)
        self._materialize()
        return self._color, self._z, self._normals

    def render_arrays(self, tri_verts, tri_norms, tri_colors,
                      post: str = "none", light=None,
                      keep_gbuffers: bool = False) -> None:
        """Dispatch one frame from raw (T, 3, 3) triangle arrays.

        The HOT path: stores the frame's packed G-buffer (Pallas backend)
        and fused ``post`` image; planar G-buffers derive lazily on getter
        access. Returns nothing — read ``get_post_image()`` /
        ``snapshot_buffers()`` / the getters.
        """
        # Pick up overflow reports from the reader thread (a lock + int
        # compare — no device traffic). Growth alone suffices here: the
        # frame about to be dispatched replaces the G-buffers anyway.
        self._settle_pending(repair=False)
        if (post == "lambert_u8" and self.fast_shade
                and self._resolve_backend() == "pallas"):
            post = "fast_lambert_u8"   # opt-in Gouraud fast path
        self._post_mode = (post, light)
        self._post_image = None
        if tri_verts.shape[0] == 0:   # empty scene → background
            # drop any queued overflow reports from the PREVIOUS model: a
            # late report must not re-render superseded geometry over the
            # empty-scene buffers
            self._invalidate_pending()
            self._validated = True   # an empty frame is trivially complete
            h, w = self.get_size()
            if post != "none":
                self._post_image = jnp.zeros((h, w, 3), jnp.uint8)
            self._set_gbuffers(
                (jnp.zeros((h, w, 3), jnp.float32),
                 jnp.full((h, w, 1), self.config.z_init, jnp.float32),
                 jnp.zeros((h, w, 3), jnp.float32)))
            return
        backend = self._resolve_backend()
        if backend == "pallas":
            from .ops import binning, raster_pallas
            if self._p_cap is not None and self._sized_for != tri_verts.shape[0]:
                self._p_cap = None
                self._g_cap = 0
                self._lean_caps = None
                self._lean_group = self._group
                self._invalidate_pending()   # old-model demands are meaningless
            if self._p_cap is None:
                # One-time sizing sync: learn the scene's bin-slot demand
                # AND its nonempty-tile count — at the exact-mode group and
                # (when legal) at group=32 for lean frames — in one
                # dispatch; cache the static buckets so animation never
                # re-syncs. _settle_pending() grows any bucket a later
                # frame overflows. The steady-state path below is exactly
                # one dispatch per frame.
                tris_screen, active = _geometry_stage(tri_verts, tri_norms,
                                                      self.config)
                dual = self._group == 16
                if dual:
                    t16, a16, t32, a32 = _dual_group_demand(
                        tris_screen, active, self.config)
                else:
                    t16, a16 = raster_pallas.grouped_frame_demand(
                        tris_screen, active, self.config, group=self._group)
                    t32 = None
                # 5% headroom (was 25%): every binning stage scales with
                # the STATIC capacity (sort, ffills, row gathers), so a
                # tight bucket is wall time — measured 1.15 -> 1.08 ms on
                # the headline. Animation demand drift past 5% triggers
                # the overflow auto-repair below, which grows the bucket
                # once and re-renders — self-correcting.
                self._p_cap = binning.capacity_bucket(int(t16) * 21 // 20,
                                                      128)
                # Live-group compaction: 25% tile headroom (scene coverage
                # drifts more than slot demand under animation; a spare
                # group costs ~1-3 us, a miss costs a repair re-render),
                # bucketed to multiples of 4 groups to keep recompiles rare.
                self._g_cap = self._group_bucket(int(a16), self._group)
                if dual and int(t32) < int(t16):   # sparse: stripe floor
                    self._lean_group = 32
                    self._lean_caps = (
                        binning.capacity_bucket(int(t32) * 21 // 20, 128),
                        self._group_bucket(int(a32), 32))
                else:
                    self._lean_group = self._group
                    self._lean_caps = (self._p_cap, self._g_cap)
                self._sized_for = tri_verts.shape[0]
            self._dispatch_pallas(tri_verts, tri_norms, tri_colors,
                                  keep_gbuffers=keep_gbuffers)
            self._track_pending(tri_verts, tri_norms, tri_colors,
                                keep_gbuffers=keep_gbuffers)
            return
        tris_screen, active = _geometry_stage(tri_verts, tri_norms, self.config)
        bbox = raster_ref.required_bbox_size(tris_screen, active, self.config)
        # fragment memory scales as chunk x bbox^2 — shrink the chunk for
        # large-triangle scenes to keep the scan's working set tame (the jnp
        # backend is the oracle/fallback path; huge-triangle scenes at high
        # resolution should use the Pallas backend, whose footprint is
        # bbox-independent)
        budget = 1 << 20
        if 8 * bbox * bbox > budget and jax.default_backend() == "tpu":
            # Hard refusal instead of a best-effort shrink: past this point
            # the fragment grid has been observed to OOM-crash the TPU
            # worker. The Pallas backend has no bbox-dependent footprint.
            raise ValueError(
                f"scene's max triangle bbox ({bbox}px) exceeds the jnp "
                f"backend's fragment budget at this resolution; use "
                f"backend='pallas' (the default on TPU) for huge-triangle "
                f"scenes")
        chunk = max(8, min(512, budget // (bbox * bbox)))
        out = raster_ref.rasterize(tris_screen, tri_colors, tri_norms, active,
                                   self.config, bbox_size=bbox, chunk=chunk)
        self._validated = True   # jnp frames have no capacity to overflow
        if post != "none":
            from .ops.illumination import cast_u8, lambert_to_u8

            self._post_image = (lambert_to_u8(out[0], out[2], light)
                                if post == "lambert_u8" else cast_u8(out[0]))
        self._set_gbuffers(out)

    def _set_gbuffers(self, out) -> None:
        """Store eager planar G-buffers (jnp backend / empty scene)."""
        self._color, self._z, self._normals = out
        self._packed = None

    def _materialize(self) -> None:
        """Derive the planar G-buffers from the packed frame, once.

        Bit-exact: ``unpack_gbuffers`` is the same unpack the eager path
        fused into its dispatch; the packed buffer IS the G-buffer data.
        A ``_DEFERRED`` frame (hot post-mode dispatch that skipped the f32
        G-buffer output entirely) first re-renders the retained newest
        inputs with ``emit_gbuf=True`` — bit-identical, the kernel is
        deterministic; animation loops that never read G-buffers never pay
        either cost.
        """
        if self._packed is None:
            return
        from .ops import raster_pallas

        if self._packed is _DEFERRED:
            assert self._latest is not None, "deferred frame without inputs"
            tv, tn, tc = self._latest[:3]
            post, light = self._post_mode   # same mode → same planes
            # the G-buffer re-render emits 8 output planes — always the
            # EXACT-mode caps (a lean dispatch may have used group=32,
            # which cannot carry 8 planes); image bit-identity holds
            # across groups (the kernel is deterministic per pixel)
            self._packed_group = self._group
            res = raster_pallas.render_frame(
                tv, tn, tc, self.config, self._p_cap, 0,
                group=self._group,
                interpret=self._interpret, post=post, light=light,
                sign_cover=self.sign_cover, packed_out=True, emit_gbuf=True,
                g_cap=self._g_cap)
            self._packed = res[0]
        self._color, self._z, self._normals = raster_pallas.unpack_gbuffers(
            self._packed, self.config, n_attrs=self._packed_attrs,
            group=self._packed_group)
        self._packed = None

    def _group_bucket(self, n_active_tiles: int, group: int) -> int:
        """Live-group cap from a nonempty-tile count: 25% headroom,
        rounded up to 4 groups; 0 (no nonempty tiles / un-grouped degrade)
        disables compaction."""
        if n_active_tiles <= 0:
            return 0
        need = -(-(n_active_tiles * 5 // 4) // group)
        return -(-need // 4) * 4

    def _caps_for(self, post: str, keep_gbuffers: bool):
        """(group, p_cap, g_cap) for a dispatch mode.

        Lean frames (3 attribute channels, no f32 G-buffer output) use the
        sizing sync's chosen lean group — 32 on sparse scenes; everything
        else the exact-mode GROUP caps.
        """
        # all hot post modes qualify: without an f32 G-buffer output the
        # kernel emits only word blocks, so the group*n_out lane constraint
        # doesn't bind and group=32 is legal even at 6 attribute channels
        lean_like = (post in ("u8", "fast_lambert_u8", "lambert_u8")
                     and not keep_gbuffers and self._lean_caps is not None)
        if lean_like:
            return (self._lean_group,) + tuple(self._lean_caps)
        return self._group, self._p_cap, self._g_cap

    def _dispatch_pallas(self, tri_verts, tri_norms, tri_colors,
                         keep_gbuffers: bool = False):
        from .ops import raster_pallas

        post, light = self._post_mode
        # post-mode frames skip the f32 G-buffer output entirely (~64 MB
        # less HBM write traffic at 1024²): the deliverable is the post
        # image; G-buffers re-render lazily on getter access (_materialize)
        group, p_cap, g_cap = self._caps_for(post, keep_gbuffers)
        self._packed_group = group
        self._last_caps = (group, p_cap, g_cap)
        res = raster_pallas.render_frame(
            tri_verts, tri_norms, tri_colors, self.config,
            p_cap, 0, group=group,
            interpret=self._interpret, post=post, light=light,
            sign_cover=self.sign_cover, packed_out=True,
            emit_gbuf=(post == "none" or keep_gbuffers),
            g_cap=g_cap)
        if post == "none":
            packed, self._last_total, self._last_active = res
        else:
            (packed, self._last_total, self._last_active,
             self._post_image) = res
            if packed is None:   # grouped hot path: G-buffer deferred
                packed = _DEFERRED
        self._packed = packed
        self._packed_attrs = 3 if post == "fast_lambert_u8" else 6
        self._color = self._z = self._normals = None

    def get_post_image(self) -> Optional[jnp.ndarray]:
        """The fused final image of the last frame (uint8), or None when the
        frame was rendered with ``post="none"``."""
        self._settle_pending()
        return self._post_image

    def _track_pending(self, tri_verts, tri_norms, tri_colors,
                       keep_gbuffers: bool = False) -> None:
        """Hand a dispatched frame's demand scalars to the reader thread.

        Only the newest frame's INPUTS are retained (the repair target —
        older frames' G-buffers are superseded); every frame's (slot
        demand, nonempty-tile count, dispatch capacities) goes to the
        queue. The reader does the blocking ``int()`` reads off the
        dispatch thread, so the render loop never waits on device scalars.
        """
        group, p_cap, g_cap = self._last_caps
        self._latest = (tri_verts, tri_norms, tri_colors, p_cap, g_cap,
                        keep_gbuffers)
        if self._reader is None:
            self._reader = _DemandReader()
            # Stop the reader thread when THIS filler is collected — the
            # reader holds no reference back to the filler, so fillers
            # (and their device buffers) stay garbage-collectable.
            weakref.finalize(self, self._reader.stop)
        self._validated = False
        self._dispatch_seq += 1
        self._reader.put(self._last_total, p_cap, self._last_active,
                         g_cap * group, self._dispatch_seq)

    def _invalidate_pending(self) -> None:
        """Drop queued/recorded demands (model changed — they're meaningless)."""
        if self._reader is not None:
            self._reader.invalidate()
        self._latest = None

    def _settle_pending(self, strict: bool = False,
                        repair: bool = True) -> bool:
        """Act on overflow reports from the reader thread; grow + repair.

        A frame overflowed when its demand exceeded the capacity it was
        DISPATCHED at. On overflow the bucket grows to 2x the observed
        demand and — when ``repair`` and the newest frame was dispatched
        below the grown capacity — the newest frame (the one in the
        G-buffers) is re-rendered. Non-strict mode (the render path) is a
        lock + integer compare: zero device traffic. ``strict=True`` (used
        by ``validate_capacity``) first joins the reader queue, so every
        dispatched frame's verdict is in. Returns True when any reported
        frame had overflowed.
        """
        from .ops import binning

        if self._reader is None:
            return False
        if strict:
            self._reader.q.join()
        demand, tiles, seq_done = self._reader.take()
        if demand == 0 and tiles == 0:
            # the reader has processed the newest dispatch's demand and
            # found it complete → the served frame is no longer provisional
            if seq_done >= self._dispatch_seq:
                self._validated = True
            return False
        if demand > self._p_cap:
            self._p_cap = binning.capacity_bucket(2 * demand, 128)
        if self._lean_caps is not None and demand > self._lean_caps[0]:
            self._lean_caps = (binning.capacity_bucket(2 * demand, 128),
                               self._lean_caps[1])
        if tiles:
            # live-group overflow: the frame rendered its smallest tiles as
            # background — grow the grid buckets (2x observed coverage)
            if self._g_cap and tiles > self._g_cap * self._group:
                self._g_cap = self._group_bucket(2 * tiles, self._group)
            if (self._lean_caps is not None and self._lean_caps[1]
                    and tiles > self._lean_caps[1] * self._lean_group):
                self._lean_caps = (self._lean_caps[0],
                                   self._group_bucket(2 * tiles,
                                                      self._lean_group))
        if repair and self._latest is not None:
            tv, tn, tc, cap, gcap, keep = self._latest
            _g, cur_p, cur_g = self._caps_for(self._post_mode[0], keep)
            if cap < cur_p or gcap < cur_g:
                # Re-render the newest frame (older frames are superseded)
                # with the same G-buffer retention it was dispatched with;
                # its own demand re-queues for the next drain.
                self._dispatch_pallas(tv, tn, tc, keep_gbuffers=keep)
                self._track_pending(tv, tn, tc, keep_gbuffers=keep)
        return True

    def get_render_stats(self) -> dict:
        """Stats of the last rendered frame (host sync on device scalars).

        Returns triangle→tile slot count and non-empty tile count for the
        Pallas backend (None on the jnp path) — the observability hook the
        reference lacked (SURVEY §5).
        """
        self.validate_capacity()
        return {
            "pairs": (int(self._last_total)
                      if self._last_total is not None else None),
            "active_tiles": (int(self._last_active)
                             if self._last_active is not None else None),
            "pair_capacity": self._p_cap,
            "live_group_capacity": self._g_cap or None,
        }

    def validate_capacity(self) -> bool:
        """Strict sync point: block until every dispatched frame's bins are
        verified to fit, repairing on overflow.

        Returns True when the latest frame was complete as dispatched. On
        overflow the capacity bucket grows AND the frame is re-rendered
        (repeatedly if needed) — unlike the reference, no truncated geometry
        survives this call. Costs a device round trip; the zero-cost lazy
        drain in the render path already detects overflow as soon as the
        reader thread's blocking read of each frame's demand scalar
        completes (typically within a frame or two) with automatic repair,
        so most callers never need this. Fixed-model scenes never overflow
        (the bucket has 25% headroom over the sizing frame).
        """
        if self._validated:   # no dispatches since the last validation
            return True
        clean = True
        for _ in range(8):   # bounded: capacity doubles on every iteration
            grew = self._settle_pending(strict=True, repair=True)
            clean = clean and not grew
            if not grew:
                break
        self._validated = True
        return clean

    # buffer getters, cy-reference naming (pyx:246-253). Each getter picks up
    # any overflow report the reader thread has posted (a lock + int compare)
    # and repairs before returning — NOT a blocking sync: on tunneled devices
    # a hard sync right after a dispatch costs ~30 ms of completion-
    # notification latency, which would serialize every animation frame.
    # The reader detects an overflow about one frame after it computes, so
    # truncation is repaired within a frame or two; validate_capacity() gives
    # the immediate strict guarantee when needed.
    @property
    def frame_provisional(self) -> bool:
        """True while the newest frame's completeness is still unconfirmed.

        The overflow detector is eventually consistent: a frame whose bin
        demand exceeded the static capacity renders truncated and is
        repaired a frame or two later, when the background reader's blocking
        demand read lands. Until ``validate_capacity()`` (or the next
        reader-confirmed drain) establishes the newest frame fit, buffers
        served by the getters are PROVISIONAL — complete in the common case
        (fixed-model scenes never overflow), but not yet guaranteed. Costs a
        lock-free bool read; no device traffic.
        """
        return not self._validated

    def snapshot_buffers(self, strict: bool = False):
        """One CONSISTENT (color, z, normals, post_image) snapshot.

        Settles queued overflow reports exactly once before reading, so all
        four tensors come from the same render generation — per-getter
        settling could repair between two reads and hand the caller a torn
        frame (e.g. pre-repair color with post-repair z).

        The snapshot may still be PROVISIONAL (see ``frame_provisional``):
        an overflow detected after this read repairs the next frame, not
        this one. ``strict=True`` calls ``validate_capacity()`` first —
        a device round trip — so the returned frame is guaranteed complete.
        """
        if strict:
            self.validate_capacity()
        else:
            self._settle_pending()
        self._materialize()
        return self._color, self._z, self._normals, self._post_image

    def get_color_buffer(self) -> jnp.ndarray:
        self._settle_pending()
        self._materialize()
        return self._color

    def get_normals_buffer(self) -> jnp.ndarray:
        self._settle_pending()
        self._materialize()
        return self._normals

    def get_z_buffer(self) -> jnp.ndarray:
        self._settle_pending()
        self._materialize()
        return self._z

    def reset_buffers(self) -> None:
        self._invalidate_pending()
        h, w = self.get_size()
        self._set_gbuffers(
            (jnp.zeros((h, w, 3), jnp.float32),
             jnp.full((h, w, 1), self.config.z_init, jnp.float32),
             jnp.zeros((h, w, 3), jnp.float32)))

    # ------------------------------------------------------------------
    # per-triangle compat path (py reference semantics)
    # ------------------------------------------------------------------

    def compute_triangle_statistics(self, triangle, colors, normals,
                                    color_buffer: Buffer, z_buffer: Buffer,
                                    n_buffer: Buffer):
        """Rasterize one triangle against caller-owned buffers.

        Matches ``py/pixel_buffer_filler/advanced_pixel_buffer_filler.py:39-82``
        including its culling rules. This is the compatibility path for code
        written against the per-triangle reference API — the batched
        ``render_model`` is the fast path.
        """
        assert color_buffer.get_size() == z_buffer.get_size() \
            == n_buffer.get_size() == self.get_size(), (
            "Buffers' spatial dimensions must be the same, but received: "
            f"color_buffer - {color_buffer.get_size()}, "
            f"z_buffer - {z_buffer.get_size()}, "
            f"n_buffer - {n_buffer.get_size()}.")

        tri = jnp.asarray(triangle, jnp.float32)[None]
        cols = jnp.asarray(colors, jnp.float32)[None]
        norms = jnp.asarray(normals, jnp.float32)[None]
        # Prelude (one small dispatch): cull + project + ceil-bbox. Culled or
        # off-screen triangles touch nothing — same as the reference's early
        # returns (py filler:59-68) and the old full-image masks.
        ts, active, xl, xr, yl, yr = _compat_prelude(tri, norms, self.config)
        if not bool(active) or int(xr) <= int(xl) or int(yr) <= int(yl):
            return
        h, w = self.config.height, self.config.width
        # Bucketed static window over the clipped ceil-bbox — the reference
        # restricts work to the bbox meshgrid (py filler:108-145); a
        # power-of-two bucket keeps jit recompiles to ~log(image dim).
        bh = _pow2_bucket(int(yr) - int(yl), h)
        bw = _pow2_bucket(int(xr) - int(xl), w)
        # Clamp the window origin so it stays inside the image; it still
        # covers the clipped bbox because the bbox fits in (bh, bw).
        y0 = min(int(yl), h - bh)
        x0 = min(int(xl), w - bw)
        color, z, normal = _raster_one_window(
            ts, cols[0], norms[0], color_buffer.array.astype(jnp.float32),
            z_buffer.array, n_buffer.array, y0, x0, self.config, bh, bw)
        color_buffer.array = color
        z_buffer.array = z
        n_buffer.array = normal


class EdgeOnlyPixelBufferFiller(PixelBufferFiller):
    """Wireframe filler — draws triangle edges (or vertices only).

    API parity with the reference
    (``edge_only/edge_only_pixel_buffer_filler.py:8-33``): vertex coordinates
    are truncated to ints and drawn *without* projection (the reference uses
    this with ``normalize_model=True`` fitting). The batched path
    (``fill_all``) replaces per-pixel ``set_pixel`` calls with the vectorized
    closed-form Bresenham in ``ops/wireframe.py``.
    """

    def __init__(self, line_drawer, line_color, draw_edges: bool = True,
                 force_triangle_colors: bool = False):
        self.line_drawer = line_drawer
        self.line_color = np.asarray(line_color)
        self.draw_edges = draw_edges
        self.force_triangle_colors = force_triangle_colors

    def compute_triangle_statistics(self, triangle, colors, normals,
                                    color_buffer: Buffer, z_buffer: Buffer,
                                    n_buffer: Buffer):
        p0 = [int(triangle[0][0]), int(triangle[0][1])]
        p1 = [int(triangle[1][0]), int(triangle[1][1])]
        p2 = [int(triangle[2][0]), int(triangle[2][1])]
        if self.draw_edges:
            self.line_drawer.draw_line(
                p0, p1, color_buffer,
                colors[0] if self.force_triangle_colors else self.line_color)
            self.line_drawer.draw_line(
                p1, p2, color_buffer,
                colors[1] if self.force_triangle_colors else self.line_color)
            self.line_drawer.draw_line(
                p2, p0, color_buffer,
                colors[2] if self.force_triangle_colors else self.line_color)
        else:
            color_buffer.set_pixel(*p0, colors[0] if self.force_triangle_colors
                                   else self.line_color)
            color_buffer.set_pixel(*p1, colors[1] if self.force_triangle_colors
                                   else self.line_color)
            color_buffer.set_pixel(*p2, colors[2] if self.force_triangle_colors
                                   else self.line_color)

    def fill_all(self, tri_verts: jnp.ndarray, tri_colors: jnp.ndarray,
                 color_arr: jnp.ndarray) -> jnp.ndarray:
        """Batched wireframe over all triangles into a color image array."""
        from .ops import wireframe

        h, w = color_arr.shape[0], color_arr.shape[1]
        t = tri_verts.shape[0]
        pts = tri_verts[..., :2].astype(jnp.int32)      # truncation, ref:20-22
        if self.draw_edges:
            starts, ends = wireframe.triangle_edges(pts)
            if self.force_triangle_colors:
                line_colors = tri_colors.reshape(t * 3, -1)
            else:
                line_colors = jnp.broadcast_to(
                    jnp.asarray(self.line_color, jnp.float32),
                    (t * 3, np.size(self.line_color)))
            active = jnp.ones((t * 3,), bool)
            # rasterize_lines clips each line to the viewport before
            # stepping (phase-preserving), so this only needs to cover the
            # ≤ max(h, w)+1 on-screen steps — endpoints up to ~16 million
            # px off-screen draw their visible segment exactly (see
            # wireframe._floordiv_exact for the precision envelope)
            max_steps = 2 * max(h, w)
            return wireframe.rasterize_lines(color_arr, starts, ends,
                                             line_colors, active, h, w,
                                             max_steps)
        # vertices only: zero-length "lines"
        pts_flat = pts.reshape(t * 3, 2)
        if self.force_triangle_colors:
            line_colors = tri_colors.reshape(t * 3, -1)
        else:
            line_colors = jnp.broadcast_to(
                jnp.asarray(self.line_color, jnp.float32),
                (t * 3, np.size(self.line_color)))
        active = jnp.ones((t * 3,), bool)
        return wireframe.rasterize_lines(color_arr, pts_flat, pts_flat,
                                         line_colors, active, h, w, 1)


def _pow2_bucket(need: int, cap: int) -> int:
    """Smallest power-of-two ≥ ``need``, clipped to ``cap`` (≥ 8)."""
    b = 8
    while b < need:
        b *= 2
    return min(b, cap)


@partial(jax.jit, static_argnames=("config",))
def _compat_prelude(tri, norms, config: RenderConfig):
    """Cull + project + ceil-bbox for one triangle (compat-path prelude)."""
    degenerate, backfacing = visibility_masks(tri, norms)
    active = jnp.logical_and(~degenerate, ~backfacing)[0]
    ts = project_to_screen(tri, config)[0]        # (3, 3)
    xl, xr, yl, yr = raster_ref.bbox_ceil(ts[None, :, :2],
                                          config.width, config.height)
    return ts, active, xl[0], xr[0], yl[0], yr[0]


@partial(jax.jit, static_argnames=("config", "bh", "bw"))
def _raster_one_window(ts, cols, norms, color_arr, z_arr, n_arr, y0, x0,
                       config: RenderConfig, bh: int, bw: int):
    """Single-triangle rasterization over a (bh, bw) bbox window.

    Mirrors the reference's bbox-meshgrid restriction (py filler:108-145):
    only the window around the triangle's clipped ceil-bbox is evaluated,
    with the same barycentric/z/strict-< rules as the batched oracle. Pixel
    coordinates are absolute, so results are bit-identical to the former
    full-image-grid formulation at ~(bbox/image)² of the cost.
    """
    c_win = jax.lax.dynamic_slice(color_arr, (y0, x0, 0), (bh, bw, 3))
    z_win = jax.lax.dynamic_slice(z_arr, (y0, x0, 0), (bh, bw, 1))
    n_win = jax.lax.dynamic_slice(n_arr, (y0, x0, 0), (bh, bw, 3))

    xl, xr, yl, yr = raster_ref.bbox_ceil(ts[None, :, :2],
                                          config.width, config.height)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    in_bbox = (px >= xl[0]) & (px < xr[0]) & (py >= yl[0]) & (py < yr[0])

    l0, l1, l2 = raster_ref.barycentric(ts[None, None, :, :2],
                                        px.astype(jnp.float32),
                                        py.astype(jnp.float32))
    inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
    z = l0 * ts[0, 2] + l1 * ts[1, 2] + l2 * ts[2, 2]
    z_ok = (z >= 0.0) & (z <= 1.0)
    win = in_bbox & inside & z_ok & (z[..., None] < z_win)[..., 0]

    bar = jnp.stack([l0, l1, l2], axis=-1)        # (bh, bw, 3)
    new_c = jnp.einsum("hwk,kd->hwd", bar, cols, precision="highest")
    new_n = jnp.einsum("hwk,kd->hwd", bar, norms, precision="highest")

    c_win = jnp.where(win[..., None], new_c, c_win)
    z_win = jnp.where(win[..., None], z[..., None], z_win)
    n_win = jnp.where(win[..., None], new_n, n_win)
    return (jax.lax.dynamic_update_slice(color_arr, c_win, (y0, x0, 0)),
            jax.lax.dynamic_update_slice(z_arr, z_win, (y0, x0, 0)),
            jax.lax.dynamic_update_slice(n_arr, n_win, (y0, x0, 0)))
