"""Pallas TPU rasterizer — tile-binned, lock-free, deterministic.

This is the production backend replacing the reference's OpenMP scanline loop
with per-pixel locks (``crender/cy/.../advanced_pixel_buffer_filler.pyx:
177-242``). Design:

* the image is a grid of VPU-aligned tiles (default 16×32 — narrower than
  the 128-lane register tile: per-candidate pixel work dominates, and the
  lane dimension is filled by candidates, not pixels); each Pallas grid
  step owns one tile — no two steps ever write the same pixel, so the
  z-race the reference locks against (and still gets wrong — pyx:223 vs
  233) cannot exist;
* triangles arrive pre-binned per tile (``ops/binning.py``) as packed
  128-lane rows carrying affine plane coefficients: the three barycentric
  edge functions, the depth plane, and all six attribute channels (color +
  normal) are affine in (x, y), so a whole tile evaluates a chunk of K
  triangles with a handful of fused multiply-adds — pure VPU work, no
  gathers, no scalar loops;
* depth resolve is a running lexicographic (z, lane) minimum in VMEM
  scratch: strict-< beats, ties keep the lowest lane (= sequential
  first-writer semantics of the reference py filler, since bins are sorted
  by triangle index). The winner's interpolated attribute values accumulate
  alongside, so the G-buffers (color, z, normal) leave the kernel finished —
  no post-pass and no XLA gather anywhere;
* two kernel variants: one tile per grid step (``_make_kernel``), and the
  default grouped variant (``_make_kernel_grouped``) packing ``group=16``
  COUNT-SORTED tiles into each 128-lane chunk as strided lane classes (balanced
  stripes: a group's chunk count ≈ its mean tile's demand, not its worst
  neighbor's), with a lane-local running argmin in the chunk loop and ONE
  unmasked roll-doubling epilogue per group computing every stripe at
  once, cross-group input-DMA pipelining via a persistent SMEM chunk
  cursor, and a statically-blocked GROUP-PACKED output (tiles reach image
  positions in a byte-cheap XLA-side gather; post images quantize
  in-kernel);
* triangle data streams HBM→VMEM with double-buffered async DMA;
* the steady-state frame is ONE jitted dispatch (``render_frame``) with a
  cached static bin capacity — no per-frame host syncs (a periodic lazy
  validation in the filler catches capacity drift; bin reads are hard-
  clamped to capacity regardless).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from . import binning

_ROW = binning.ROW_WIDTH
_ATTR0 = binning.IDX_ATTRS
# rows actually carrying data: 12 plane coeffs + 4 bbox + 3*n_attrs
# attribute-plane coeffs; the rest of the 64-wide row is zero padding.
# The grouped kernel's pre-transposed layout trims the DMA to these rows
# (~47% less chunk traffic than the full 64-row block; fast-shade mode
# carries 3 attr channels instead of 6, trimming further).
def _rows_used(n_attrs: int) -> int:
    return binning.IDX_ATTRS + 3 * n_attrs


_ROWS_USED = _rows_used(binning.N_ATTRS)


def _out_stripes(n_attrs: int) -> int:
    # packed G-buffer lane-stripes per tile: [B G R z nx ny nz pad] exact,
    # [B G R z] fast-shade (halves the output block traffic)
    return 4 if n_attrs == 3 else 8


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _good_mask(l0, l1, l2, z, pxf, pyf, xl, xr, yl, yr, sign_cover: bool):
    """The full per-candidate predicate: ``λ≥0`` coverage, ceil-bbox
    containment, and z∈[0,1], combined into one mask.

    ``sign_cover=False`` (the default) is the exact reference rule: nine
    IEEE compares + combines. ``sign_cover=True`` is the opt-in sign-bit
    fold: every term becomes a "≥ 0" check of a float, so OR the raw bit
    patterns of all nine and test the combined sign once —
    ``a ≥ b`` folds as ``sign(a - b)`` and the strict ``pxf < xr`` bound
    folds as ``sign((xr - 1) - pxf)`` (exact: both sides are small
    integers in f32). NOT reference-exact: a term that evaluates to -0.0
    counts as ≥ 0 under IEEE but reads negative by sign bit. The λ planes
    can produce -0.0 (pixel center exactly on an edge: a negative-signed
    zero product), so edge pixels may flip vs the exact rule; the
    subtractive bbox terms cannot (x - x = +0.0 in round-to-nearest).
    NaN λ/z flips the other way (sign bit 0 → "pass"), but a NaN z makes
    the candidate lose every ``zc < zacc`` compare, so it never wins a
    pixel. Zeroed capacity-padding rows keep failing the bbox terms
    ((xr-1) - pxf = -1 - pxf < 0). Default off: exact parity.
    """
    if sign_cover:
        bits = (_bits(l0) | _bits(l1) | _bits(l2)
                | _bits(pxf - xl) | _bits((xr - 1.0) - pxf)
                | _bits(z) | _bits(1.0 - z))
        ybits = _bits(pyf - yl) | _bits((yr - 1.0) - pyf)   # stays (TH,1,K)
        return (bits | ybits) >= 0
    cover = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
    okx = (pxf >= xl) & (pxf < xr)          # ceil-bbox rule
    oky = (pyf >= yl) & (pyf < yr)
    zok = (z >= 0.0) & (z <= 1.0)
    return cover & okx & oky & zok

# default raster tile: 16 x 32 px (512-px area, like 8x64, but squarer).
# Narrow tiles on purpose — the lane dimension carries bin candidates,
# not pixels, so per-candidate pixel work scales with tile area; the
# squarer shape measured fastest on the bench matrix (T-Rex -4%, igor
# -1.6% vs 8x64; see PERF_NOTES "Config sensitivities"). Callers that
# size capacity (grouped_slot_total) and dispatch (render_frame) MUST
# use the same tile.
TILE_H = 16
TILE_W = 32


def view_row_stride(nty: int, group: int) -> int:
    """Tile-row stride between stacked views in view-batched rendering.

    Both kernels and the batched caller must lay view ``v``'s tile rows at
    ``v * view_row_stride(...)`` — the per-view row count padded to a
    multiple of the lane-subgroup ``group`` (the grouped binner composes
    groups over the padded grid).
    """
    return -(-nty // group) * group
# default lane-subgroup packing: 16 count-sorted tiles per 128-lane chunk
# (8-lane strided classes). The per-GROUP epilogue made group size a
# first-order lever (the old per-stripe epilogue was group-invariant):
# g16 halves the nonempty-group count at roughly constant per-group cost
# (one fewer doubling round), packs the output block's 128 lanes exactly
# (16 stripes x 8 planes), and halves the sparse-scene per-tile slot
# floor (sub=8) — measured 1.50 -> 1.30 ms on the T-Rex headline vs g8.
# g32 cannot carry the 8 exact-mode planes (32*8 > 128 lanes). Must
# divide 128 and satisfy group * n_out <= 128.
GROUP = 16


def _make_kernel(ntx: int, tile_h: int, tile_w: int, chunk: int,
                 z_init: float, n_attrs: int = binning.N_ATTRS,
                 sign_cover: bool = False, tiles_per_view: int = 0):
    n_out = _out_stripes(n_attrs)

    def kernel(starts_ref, counts_ref, binned_ref,
               out_ref,
               buf, zacc, attracc, sems):
        # NOTE: a compacted grid over only non-empty tiles (scalar-prefetched
        # tile ids driving the output index_map) was tried and is ~12x SLOWER:
        # data-dependent output windows defeat Mosaic's output pipelining.
        # Empty tiles cost little on the static grid (no chunks, one write).
        i = pl.program_id(0)
        start = starts_ref[i]
        count = counts_ref[i]
        # VIEW BATCHING: the tile grid may stack several views vertically
        # (tile id = view * tiles_per_view + local id). Plane rows are
        # view-relative, so pixel coordinates come from the LOCAL tile
        # position; only the output placement (the grid index_map) uses the
        # stacked id. tiles_per_view == 0 → single view.
        iloc = i % tiles_per_view if tiles_per_view else i
        tx = iloc % ntx
        ty = iloc // ntx

        # Empty tiles (most of the image for typical scenes) take a fast
        # path: write the constant background block and skip all setup —
        # the full epilogue costs ~1.4 us/tile in relayouts otherwise.
        zstripe = jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, n_out * tile_w), 1) // tile_w == 3
        bg_block = jnp.where(zstripe, jnp.float32(z_init), 0.0)

        @pl.when(count == 0)
        def _():
            out_ref[:] = bg_block

        @pl.when(count > 0)
        def _():
            _raster_tile(start, count, tx, ty, i // ntx, binned_ref, out_ref,
                         buf, zacc, attracc, sems)

    def _raster_tile(start, count, tx, ty, tyg, binned_ref, out_ref,
                     buf, zacc, attracc, sems):
        # Pixel coordinates in native (TH, TW, 1) tile layout — every
        # per-pixel array in this kernel is a full (8, 128) register tile, so
        # the VPU runs at full lane occupancy (a (P, 1) column layout would
        # waste 127/128 lanes and force relayouts on every op).
        ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w, 1), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1, 1), 0)
        pxf = (tx * tile_w + ix).astype(jnp.float32)
        pyf = (ty * tile_h + iy).astype(jnp.float32)   # (TH, 1, 1)
        # stacked-global pixel row for the y-bbox test (== pyf unbatched;
        # see the grouped kernel for why view batching needs it)
        pyg = (pyf if not tiles_per_view
               else (tyg * tile_h + iy).astype(jnp.float32))

        zacc[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)

        nchunks = (count + chunk - 1) // chunk

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                binned_ref.at[pl.ds(start + j * chunk, chunk)],
                buf.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            get_dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < nchunks)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(slot, j).wait()
            # (an MXU identity-contraction transpose was tried here: the
            # matmul runs at bf16 input precision and wrecks the plane
            # coefficients — keep the vector relayout)
            d = jnp.swapaxes(buf[slot], 0, 1)           # (ROW, K)

            # rows: [A0 B0 C0 A1 B1 C1 A2 B2 C2 Az Bz Cz xl xr yl yr
            #        18×attr-plane]
            def row(r):
                return d[r:r + 1, :].reshape(1, 1, chunk)

            def plane(r):
                # affine tile evaluation → (TH, TW, K); the y-term is
                # grouped first so it stays a (TH, 1, K)-shaped partial
                # before the single full-width FMA against pxf (the
                # left-to-right order would broadcast BOTH adds to full
                # width — a measured ~5% kernel cost)
                return pxf * row(r) + (pyf * row(r + 1) + row(r + 2))

            l0 = plane(0)
            l1 = plane(3)
            l2 = plane(6)
            z = plane(9)

            # No explicit count mask: a chunk's tail may read rows from
            # neighboring bins, but any row whose bbox overlaps THIS tile is
            # by construction also in this tile's own segment (binning emits
            # a pair for every overlapped tile), so tail rows are either
            # harmless duplicates or fail the bbox test; capacity padding is
            # zeroed rows (empty bbox). (With view batching the y-bbox is
            # stacked-global, so cross-view tail rows fail it too.)
            good = _good_mask(l0, l1, l2, z, pxf, pyg, row(12), row(13),
                              row(14), row(15), sign_cover)
            zc = jnp.where(good, z, jnp.inf)
            zmin = jnp.min(zc, axis=2, keepdims=True)   # (TH, TW, 1)
            # First lane achieving the min = lowest-priority winner (bins
            # are sorted by triangle index within each tile). All-float
            # arithmetic: int32 lane selects/reductions lower poorly.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, chunk), 2) \
                .astype(jnp.float32)
            tie = zc == zmin
            lmin = jnp.min(jnp.where(tie, lane, jnp.inf), axis=2,
                           keepdims=True)
            winmask = tie & (lane == lmin)              # one-hot along lanes

            better = zmin[..., 0] < zacc[:]             # (TH, TW)
            # Accumulate the chunk winner's interpolated attribute values
            # (where, not multiply: loser lanes may hold inf/NaN planes).
            for ch in range(n_attrs):
                v = plane(_ATTR0 + 3 * ch)
                vwin = jnp.sum(jnp.where(winmask, v, 0.0), axis=2)
                attracc[ch] = jnp.where(better, vwin, attracc[ch])
            zacc[:] = jnp.where(better, zmin[..., 0], zacc[:])
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)

        zfin = zacc[:]
        has = ~jnp.isinf(zfin)                          # (TH, TW)

        def chan(ch):
            return jnp.where(has, attracc[ch], 0.0)

        # Single packed G-buffer write: the channels live as lane-stripes
        # of one (tile_h, n_out*tile_w) block — one output DMA per grid step.
        zplane = jnp.where(has, zfin, jnp.float32(z_init))
        planes = [chan(0), chan(1), chan(2), zplane]
        if n_attrs == binning.N_ATTRS:
            planes += [chan(3), chan(4), chan(5), jnp.zeros_like(zplane)]
        out_ref[:] = jnp.concatenate(planes, axis=1)

    return kernel


def _make_kernel_grouped(ntx: int, tile_h: int, tile_w: int, chunk: int,
                         group: int, z_init: float,
                         n_attrs: int = binning.N_ATTRS,
                         sign_cover: bool = False, tiles_per_view: int = 0,
                         nbuf: int = 2,
                         probe_reps: Tuple[int, int] = (1, 1),
                         post: str = None, emit_gbuf: bool = True):
    """Grouped kernel: one grid step = ``group`` COUNT-SORTED tiles.

    Chunks interleave the tiles as STRIDED lane classes (stripe s owns
    lanes {s, s+group, ...} — see ``binsort_pallas.bin_gather_grouped``),
    so sparse tiles share their chunk's lanes with denser neighbors —
    ~2-3x fewer chunk iterations than one-tile-per-step on typical scenes.
    Group membership follows the binner's count-sorted composition
    (``stids``): each stripe's tile id — hence its pixel-coordinate bases —
    is data read via scalar prefetch.

    Depth resolve is a LANE-LOCAL running minimum in the chunk loop (plain
    compare+selects — the hot path has no cross-lane traffic at all) with
    ONE group epilogue computing all ``group`` stripes at once: the strided
    lane classes are invariant under circular lane rolls by multiples of
    ``group``, so the segmented min/argmin/winner-gather are UNMASKED
    Hillis-Steele roll-doubling (log2(sub) rounds), every full-width tensor
    (zacc, the 6 attr accumulators) is read from VMEM exactly once per
    group, and the group's whole output assembles into ONE full-width
    (TH, TW, K) block — lane ``s + group*p`` holds plane p of stripe s
    (each doubled tensor already carries stripe ``lane % group``'s value at
    every lane, so assembly is ``n_out`` lane-class selects, no extracts,
    no per-stripe reductions). Measured on-chip (tools/probes/epi_prims.py
    epi_cur8 vs epi_rr_group): 9.4 → 3.6 us/group — the former per-stripe
    epilogue re-streamed the full accumulators once per stripe.

    First-writer tie semantics come FREE from the binner's strided
    LANE-CLASS rank layout: within a stripe, class-lane m holds the
    contiguous bin-rank block [m*B, (m+1)*B) (B = the group's chunk count;
    bins are sorted by triangle index, so rank order == sequential order).
    Lane-local strict-< keeps the earliest rank per lane (a lane's ranks
    grow with the chunk index), and across a class min-rank == MIN LANE,
    so the epilogue breaks exact z ties with the lane iota — no rank
    accumulator, no rank reduction.

    The GROUP-PACKED output (one ``(TH, TW, K)`` block per group, ordered
    by group) makes the output a statically-blocked pallas output — Mosaic
    pipelines it; no manual output DMA, no per-stripe semaphores, no
    background aliasing (empty groups write a constant bg block). Tiles
    reach their image positions in the XLA-side unpack (a gather by
    ``stids`` — cheap on the hot path because ``post`` modes quantize
    IN-KERNEL and gather only the 1-byte image; the f32 planar G-buffers
    derive lazily).

    ``post`` (static): None emits only the packed G-buffer; "u8" adds a
    uint8 output block with the quantized B, G, R planes in the same
    lane-class layout; "lambert_u8" additionally Lambert-shades in-kernel
    (same formula as ``ops.illumination.lambert_shade``, reading the
    pre-negated normalized light from scalar prefetch).

    ``probe_reps=(body_reps, epi_reps)`` is the IN-SITU SLOPE PROBE
    (tools/probes/raster_slope.py): replicate the chunk-body arithmetic /
    the group epilogue block R times inside this very kernel — same
    layouts, same compiler — and fit ms vs R to split ALU cost from fixed
    overhead (PERF_NOTES roadmap 1). Replicas perturb their input by
    ``rep * 1e-30`` (folds to identity at runtime in f32, so every rep
    computes the production values — the kernel stays bit-exact — while
    the rep-dependence defeats loop-invariant hoisting). ``(1, 1)`` (the
    default, the production path) generates exactly the unreplicated code.
    """
    sub = chunk // group
    n_out = _out_stripes(n_attrs)
    # the lane-packing constraint binds only the f32 G-buffer output; a
    # post-only frame's word blocks use one lane class per stripe
    assert not emit_gbuf or group * n_out <= chunk, \
        "group-packed G-buffer output needs group * n_out lanes"

    assert emit_gbuf or post is not None, \
        "a frame must emit at least one of (G-buffer, post image)"

    # PACKED-BGR accumulation (hot frames without an f32 G-buffer output):
    # the attribute accumulators only ever SELECT a candidate's values
    # (never blend), so any per-candidate computation commutes with winner
    # selection — quantize (and for "lambert_u8", SHADE: the shadow is a
    # function of the candidate's own interpolated normal, so shading
    # per-lane then selecting equals selecting then shading, bit-for-bit)
    # at accumulation time and pack the three u8-truncated channels into
    # ONE i32 word per lane. Chunk loop: one accumulator RMW instead of
    # three/six; epilogue: one one-hot sum segred instead of three/six.
    # The ``& 255`` masks reproduce the deferred path's i32→u8 wrap.
    pack_bgr = post == "u8" and not emit_gbuf and n_attrs == 3
    pack_shaded = post == "lambert_u8" and not emit_gbuf
    pack_word = pack_bgr or pack_shaded

    def kernel(gstarts_ref, gchunks_ref, stids_ref, sstripes_ref, light_ref,
               binned_ref, *out_and_scratch):
        outs, scratch = (out_and_scratch[:int(emit_gbuf) + int(post is not None)],
                         out_and_scratch[int(emit_gbuf) + int(post is not None):])
        out_ref = outs[0] if emit_gbuf else None
        u8_ref = outs[-1] if post is not None else None
        buf, zacc, attracc, sems, pref = scratch
        i = pl.program_id(0)
        n = pl.num_programs(0)
        start = gstarts_ref[i]
        nchunks = gchunks_ref[i]

        # pref (SMEM, persists across grid steps): highest chunk id whose
        # DMA has been issued — group bins are contiguous AND 128-aligned,
        # so the DMA stream pipelines ACROSS groups (the previous group's
        # last iteration prefetches this group's first chunk).
        @pl.when(i == 0)
        def _():
            pref[0] = -1

        # empty (or overflow-clamped) group: constant background block —
        # z_init in the z plane's lane class, zero elsewhere
        @pl.when(nchunks == 0)
        def _():
            if emit_gbuf:
                pcls = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, tile_w, chunk), 2) // group
                out_ref[0] = jnp.where(pcls == 3, jnp.float32(z_init), 0.0)
            if post is not None:
                # all grouped post modes emit BGR0 i32 word blocks
                u8_ref[0] = jnp.zeros((tile_h, tile_w, chunk), jnp.int32)

        @pl.when(nchunks > 0)
        def _():
            _raster_group(start, nchunks, i, stids_ref, light_ref,
                          binned_ref, out_ref, u8_ref, buf, zacc, attracc,
                          sems, pref, gstarts_ref[n] // chunk)

    def _raster_group(start, nchunks, i, stids_ref, light_ref,
                      binned_ref, out_ref, u8_ref, buf, zacc, attracc,
                      sems, pref, total_chunks):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, chunk), 2)
        seg = lane % group
        # STRIDED LANE-CLASS bin layout (binsort_pallas): stripe s owns
        # lanes {s, s+group, ...}; within the class, class-lane m holds the
        # contiguous rank block [m*B, (m+1)*B) (B = this group's chunk
        # count), so lane order == bin-rank order == sequential triangle
        # order — exact z ties resolve to the MIN LANE in the epilogue and
        # no rank accumulator is needed anywhere
        lanef = lane.astype(jnp.float32)                   # (1, 1, K)
        ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w, 1), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1, 1), 0)
        # per-lane pixel-coordinate bases: stripe s rasterizes tile
        # stids[group*i + s] (count-sorted composition), so the tile origin
        # is DATA — a handful of scalar reads + selects per group
        txv = jnp.zeros_like(seg)
        tyv = jnp.zeros_like(seg)
        tygv = jnp.zeros_like(seg)
        for s in range(group):
            tid = stids_ref[group * i + s]
            # VIEW BATCHING: plane evaluation uses the tile's LOCAL
            # position within its view (plane rows are view-relative), but
            # the y-BBOX test and out_dma use the full STACKED id — the
            # stacked y-bbox is what rejects another view's rows when a
            # chunk tail reads across bins. 0 → single view.
            tloc = tid % tiles_per_view if tiles_per_view else tid
            txv = jnp.where(seg == s, tloc % ntx, txv)
            tyv = jnp.where(seg == s, tloc // ntx, tyv)
            tygv = jnp.where(seg == s, tid // ntx, tygv)
        pxf = (txv * tile_w + ix).astype(jnp.float32)      # (TH, TW, K)
        pyf = (tyv * tile_h + iy).astype(jnp.float32)      # (TH, 1, K)
        # stacked-global pixel row for the y-bbox test (== pyf unbatched)
        pyg = (pyf if not tiles_per_view
               else (tygv * tile_h + iy).astype(jnp.float32))

        zacc[:] = jnp.full((tile_h, tile_w, chunk), jnp.inf, jnp.float32)

        c0 = start // chunk

        def get_dma(c):
            # chunks are pre-transposed XLA-side to (blocks, ROWS_USED, K):
            # the DMA lands in the layout the plane evaluation reads, so no
            # in-kernel relayout (a (128,128) vector transpose cost ~0.8 ms
            # per frame) and only the non-zero rows move (~73% less traffic)
            return pltpu.make_async_copy(
                binned_ref.at[c],
                buf.at[c % nbuf],
                sems.at[c % nbuf],
            )

        def body(j, _):
            c = c0 + j

            # cold start: this chunk was not prefetched by a predecessor
            @pl.when(pref[0] < c)
            def _():
                get_dma(c).start()

            # keep the DMA stream nbuf-1 chunks ahead (possibly into the
            # next group's bins — chunks are globally contiguous); the pref
            # cursor guard means each chunk is issued exactly once
            for k in range(1, nbuf):
                @pl.when((pref[0] < c + k) & (c + k < total_chunks))
                def _(k=k):
                    get_dma(c + k).start()

            pref[0] = jnp.maximum(
                pref[0], jnp.minimum(c + nbuf - 1, total_chunks - 1))
            get_dma(c).wait()
            d = buf[c % nbuf]                           # (ROWS_USED, K)

            def row(r):
                return d[r:r + 1, :].reshape(1, 1, chunk)

            def alu(bias):
                # the chunk-body ALU block — the slope probe replicates
                # exactly this, perturbing each plane's constant term by
                # ``bias`` (None in production → unchanged code)
                def plane(r):
                    # y-term grouped first: stays (TH, 1, K) until the
                    # single full-width FMA (same association as the
                    # un-grouped kernel — the two must stay bit-identical)
                    t = row(r + 2) if bias is None else row(r + 2) + bias
                    return pxf * row(r) + (pyf * row(r + 1) + t)

                l0 = plane(0)
                l1 = plane(3)
                l2 = plane(6)
                z = plane(9)

                # (a single min-tree fold of all nine conditions via
                # jnp.minimum was tried here and measured ~2% SLOWER —
                # NaN-propagating minimum lowers to compare+select pairs,
                # costlier than plain compare+and; the sign-bit OR fold is
                # the cheap version of the same idea, opt-in because -0.0
                # edge evals flip)
                good = _good_mask(l0, l1, l2, z, pxf, pyg, row(12), row(13),
                                  row(14), row(15), sign_cover)
                zc = jnp.where(good, z, jnp.inf)

                # Lane-local running argmin: strict < keeps the EARLIEST
                # rank per lane across chunks (a lane's rank grows with j
                # under the lane-block layout). No cross-lane ops in the
                # chunk loop — the segmented reduction happens once in the
                # epilogue. NaN guard: loser lanes may hold NaN attr planes
                # but their zc is +inf, so they never become `better`.
                better = zc < zacc[:]                    # (TH, TW, K)
                if pack_word:
                    # quantize-(and shade-)at-accumulation (see pack note
                    # above): one i32 BGR0 word per lane, one RMW
                    cb = plane(_ATTR0)
                    cg = plane(_ATTR0 + 3)
                    cr = plane(_ATTR0 + 6)
                    if pack_shaded:
                        # per-candidate Lambert (ops.illumination formula):
                        # identical inputs/order as the deferred epilogue
                        # shade of the selected winner → bit-equal
                        nx = plane(_ATTR0 + 9)
                        ny = plane(_ATTR0 + 12)
                        nz = plane(_ATTR0 + 15)
                        lx, ly, lz = light_ref[0], light_ref[1], light_ref[2]
                        dot = nx * lx + ny * ly + nz * lz
                        nrm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
                        shadow = jnp.clip(dot / (nrm + jnp.float32(1e-6)),
                                          0.0, 1.0)
                        cb, cg, cr = cb * shadow, cg * shadow, cr * shadow
                    w = ((cb.astype(jnp.int32) & 255)
                         | ((cg.astype(jnp.int32) & 255) << 8)
                         | ((cr.astype(jnp.int32) & 255) << 16))
                    attracc[0] = jnp.where(better, w, attracc[0])
                else:
                    for ch in range(n_attrs):
                        attracc[ch] = jnp.where(better,
                                                plane(_ATTR0 + 3 * ch),
                                                attracc[ch])
                zacc[:] = jnp.where(better, zc, zacc[:])

            if probe_reps[0] == 1:
                alu(None)
            else:
                def rep_body(rep, _):
                    # rep-dependent bias defeats hoisting; ·1e-30 folds to
                    # identity at runtime, so every rep computes the
                    # production values against the live accumulators
                    alu(rep.astype(jnp.float32) * jnp.float32(1e-30))
                    return 0
                jax.lax.fori_loop(0, probe_reps[0], rep_body, 0)
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)

        # GROUP-PACKED epilogue: the strided lane classes are roll-
        # invariant, so one unmasked Hillis-Steele doubling ladder reduces
        # EVERY stripe at once (log2(sub) circular rolls by multiples of
        # ``group``); the one-hot winner mask turns the attribute gather
        # into an exact sum; and the whole group's output assembles into
        # one full-width block — lane s + group*p = plane p of stripe s
        # (each doubled tensor already carries stripe (lane % group)'s
        # value at EVERY lane, so assembly is n_out lane-class selects).
        # zacc and the n_attrs accumulators are read from VMEM exactly
        # ONCE — the former per-stripe formulation re-streamed all of them
        # per stripe, which measured as 60% of the epilogue cost
        # (epi_cur8 9.4 vs epi_rr_group 3.6 us/group, epi_prims probe).
        # (Older dead ends, all on the CONTIGUOUS lane-block layout:
        # (TH, TW, G, sub) reshape — Mosaic rejects the lane shape cast;
        # MASKED butterfly + per-stripe lane-extracts — extracts are
        # relayout-priced, measured ~8% slower than masked reductions.)
        zfin = zacc[:]
        afin = attracc[:]                                # (n_attrs, TH, TW, K)
        pcls = lane // group                             # (1, 1, K)

        def segred(v, op):
            sh = group
            while sh < chunk:
                v = op(v, pltpu.roll(v, sh, 2))
                sh *= 2
            return v

        def epilogue(bias=None):
            # ``bias`` is the slope probe's perturbation (None in
            # production): rep-dependent but runtime-identity, so every
            # replica recomputes this whole block from live values
            zf = zfin if bias is None else zfin + bias
            ztb = segred(zf, jnp.minimum)                # class z-min, all lanes
            cand = zf == ztb
            lmb = segred(jnp.where(cand, lanef, jnp.inf), jnp.minimum)
            win = cand & (lanef == lmb)                  # one-hot per class
            has = ~jnp.isinf(ztb)
            if pack_word:
                # ONE one-hot sum segred extracts the winner's packed BGR0
                # word (exact: zeros plus one i32 word per class) and the
                # block output IS the word array — every lane holds its
                # stripe's (lane % group) full BGR0 pixel word, so the
                # XLA-side assembly is a lane slice + row gather with no
                # byte deinterleave anywhere (the u8-block variant's
                # convert+relayout chain measured ~105 us/frame)
                wwin = segred(jnp.where(win, afin[0], 0), jnp.add)
                u8_ref[0] = jnp.where(has, wwin, 0)
                return
            planes = []
            for ch in range(n_attrs):
                aw = jnp.where(win, afin[ch], 0.0)
                # one-hot sum == the winner's value, exactly (adding
                # zeros; a -0.0 attr flips to +0.0 — numerically equal)
                planes.append(jnp.where(has, segred(aw, jnp.add), 0.0))
            if emit_gbuf:
                zt_out = jnp.where(has, ztb, jnp.float32(z_init))
                order = [planes[0], planes[1], planes[2], zt_out]
                if n_attrs == binning.N_ATTRS:
                    order += [planes[3], planes[4], planes[5],
                              jnp.zeros_like(zt_out)]
                gout = jnp.zeros_like(zf)
                for p, t in enumerate(order):
                    gout = jnp.where(pcls == p, t, gout)
                out_ref[0] = gout
            if post is not None:
                if post == "lambert_u8":
                    # in-kernel Lambert (ops.illumination.lambert_shade):
                    # light is the pre-negated normalized direction
                    lx, ly, lz = light_ref[0], light_ref[1], light_ref[2]
                    nx, ny, nz = planes[3], planes[4], planes[5]
                    dot = nx * lx + ny * ly + nz * lz
                    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
                    shadow = jnp.clip(dot / (norm + jnp.float32(1e-6)),
                                      0.0, 1.0)
                    cb, cg, cr = (planes[0] * shadow, planes[1] * shadow,
                                  planes[2] * shadow)
                else:                                    # "u8"
                    cb, cg, cr = planes[0], planes[1], planes[2]
                # emit BGR0 i32 word blocks (every lane holds its stripe's
                # full pixel word), exactly like the pack_bgr branch — the
                # XLA assembly is then a lane slice + row gather with no
                # byte deinterleave (the u8-block chain measured ~0.29 ms
                # vs ~0.05). The ``& 255`` masks equal the old i32→u8 wrap.
                u8_ref[0] = ((cb.astype(jnp.int32) & 255)
                             | ((cg.astype(jnp.int32) & 255) << 8)
                             | ((cr.astype(jnp.int32) & 255) << 16))

        if probe_reps[1] == 1:
            epilogue()
        else:
            def rep_body(rep, _):
                epilogue(rep.astype(jnp.float32) * jnp.float32(1e-30))
                return 0
            jax.lax.fori_loop(0, probe_reps[1], rep_body, 0)

    return kernel


def _raster_tiles_grouped(binned, gstarts, gchunks, stids, sstripes,
                          ntx: int, nty: int,
                          tile_h: int, tile_w: int, chunk: int, group: int,
                          z_init: float, interpret: bool,
                          n_attrs: int = binning.N_ATTRS,
                          sign_cover: bool = False,
                          tiles_per_view: int = 0,
                          nbuf: int = 2,
                          probe_reps: Tuple[int, int] = (1, 1),
                          post: str = None, light=None,
                          emit_gbuf: bool = True, g_cap: int = 0):
    """Dispatch the grouped kernel.

    Returns the GROUP-PACKED G-buffer ``(n_groups, tile_h, tile_w, chunk)``
    f32 — lane ``s + group*p`` of group g's block holds plane p of the tile
    at sorted position ``g*group + s`` (``stids``) — plus, when ``post`` is
    set, the matching uint8 block array with the (shaded) quantized B, G, R
    planes. Tiles reach image positions in ``unpack_gbuffers`` /
    ``assemble_u8_image`` (XLA-side gather by ``stids``).

    ``g_cap`` (static) is LIVE-GROUP GRID COMPACTION: the count-sorted
    composition puts every nonempty tile at sorted positions
    ``[0, n_active)``, so the nonempty groups are a PREFIX of the group
    order — the grid (and both output arrays) can stop at a static bucket
    of live groups instead of covering the whole tile grid. Empty groups
    past the cap never take a grid step and never write a background
    block; the XLA-side unpack substitutes the background for tiles whose
    sorted position falls past the cap (safe for ANY cap value: a live
    tile past the cap simply renders as background until the caller
    re-renders). 0 = full grid (no compaction). Callers detect a too-small
    cap via the returned n_active tile count (``n_active > g_cap * group``)
    and re-render at a grown cap — same loop as pair-capacity overflow.
    """
    n_tiles = ntx * nty
    n_sorted = -(-n_tiles // group) * group
    n_groups = n_sorted // group
    if g_cap:
        n_groups = min(n_groups, g_cap)
    rows_used = _rows_used(n_attrs)
    kernel = _make_kernel_grouped(ntx, tile_h, tile_w, chunk, group, z_init,
                                  n_attrs, sign_cover, tiles_per_view, nbuf,
                                  probe_reps, post, emit_gbuf)
    blk = (1, tile_h, tile_w, chunk)
    out_specs = []
    out_shapes = []
    if emit_gbuf:
        out_specs.append(pl.BlockSpec(blk, lambda i, *_: (i, 0, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct(
            (n_groups, tile_h, tile_w, chunk), jnp.float32))
    # packed-word hot frames additionally accumulate the three quantized
    # (and, for lambert_u8, pre-shaded) channels in ONE i32 word per lane
    # (see _make_kernel_grouped)
    pack_word = ((post == "u8" and n_attrs == 3) or post == "lambert_u8") \
        and not emit_gbuf
    if post is not None:
        # post frames emit BGR0 i32 word blocks (deinterleave-free
        # assembly); on the hot path (G-buffer deferred) this is the
        # frame's ONLY output — the ~64 MB f32 block write drops out
        out_specs.append(pl.BlockSpec(blk, lambda i, *_: (i, 0, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct(
            (n_groups, tile_h, tile_w, chunk), jnp.int32))
    attracc_shape = (pltpu.VMEM((1, tile_h, tile_w, chunk), jnp.int32)
                     if pack_word else
                     pltpu.VMEM((n_attrs, tile_h, tile_w, chunk),
                                jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],   # binned chunks
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((nbuf, rows_used, chunk), jnp.float32),
            pltpu.VMEM((tile_h, tile_w, chunk), jnp.float32),
            attracc_shape,
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    # pre-transpose + trim outside the kernel: XLA's transpose is HBM-
    # bandwidth bound on a few MB (tens of us) vs ~0.8 ms of in-kernel
    # vector relayout per frame (the caller may have pre-trimmed the
    # gathered rows to rows_used columns already — see _stage_b)
    blocks = binned.shape[0] // chunk
    binned_t = binned.reshape(blocks, chunk, binned.shape[-1]) \
        .swapaxes(1, 2)[:, :rows_used, :]
    if light is None:
        light_arr = jnp.zeros((3,), jnp.float32)
    else:
        light_arr = jnp.asarray(light, jnp.float32).reshape(3)
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(gstarts, gchunks, stids, sstripes, light_arr, binned_t)
    return ((out[0] if emit_gbuf else None),
            (out[-1] if post is not None else None))


def _raster_tiles(binned, tile_starts, tile_counts,
                  p_cap: int, ntx: int, nty: int,
                  tile_h: int, tile_w: int, chunk: int,
                  z_init: float, interpret: bool,
                  n_attrs: int = binning.N_ATTRS,
                  sign_cover: bool = False,
                  tiles_per_view: int = 0):
    n_tiles = ntx * nty
    n_out = _out_stripes(n_attrs)
    # Mosaic DMA slices must be 128-aligned in the minor dim, and this
    # path's chunk starts are NOT 128-row-aligned (per-tile bin offsets),
    # so it cannot use the grouped path's pre-transposed trimmed layout —
    # pad the 64-wide plane rows back to a full 128-lane row instead.
    # (Fallback path only; the extra copy is acceptable.)
    if binned.shape[1] != 128:
        binned = jnp.pad(binned, ((0, 0), (0, 128 - binned.shape[1])))
    kernel = _make_kernel(ntx, tile_h, tile_w, chunk, z_init, n_attrs,
                          sign_cover, tiles_per_view)
    # one packed output: tile (ty, tx) owns a (tile_h, n_out*tile_w) stripe
    # block holding [B G R z ...] as lane-stripes; no cross-step hazards
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((tile_h, n_out * tile_w),
                               lambda i, *_: (i // ntx, i % ntx)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.VMEM((tile_h, tile_w), jnp.float32),
            pltpu.VMEM((n_attrs, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (nty * tile_h, ntx * n_out * tile_w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * p_cap * tile_h * tile_w,
            bytes_accessed=p_cap * 128 * 4
            + n_tiles * tile_h * tile_w * n_out * 4,
            transcendentals=0,
        ),
    )(tile_starts, tile_counts, binned)


@functools.partial(jax.jit, static_argnames=("config", "tile_h", "tile_w"))
def _stage_a(tris_screen, colors, normals, active,
             config: RenderConfig, tile_h: int, tile_w: int):
    """Plane/attribute precompute + tile spans + total pair count."""
    return _plane_stage(tris_screen, colors, normals, active,
                        config, tile_h, tile_w)


def _plane_stage(tris_screen, colors, normals, active,
                 config: RenderConfig, tile_h: int, tile_w: int):
    # normals=None → fast-shade rows (3 attr channels, see binning)
    rows, tx0, cx, ty0, cy, counts = binning.plane_data(
        tris_screen, active, config, tile_h, tile_w,
        colors=colors, normals=normals)
    total = jnp.sum(counts)
    return rows, tx0, cx, ty0, cy, counts, total


def unpack_channels(packed, tile_h: int, tile_w: int, n_attrs: int):
    """Planar channel images from a packed stripe G-buffer.

    ``packed`` is the raster kernels' output: tile (ty, tx) owns the
    (tile_h, n_out*tile_w) block at its image position, holding the
    channels [B G R z nx ny nz pad] (exact) or [B G R z] (fast-shade) as
    ``tile_w``-wide lane-stripes. Pure layout ops — under jit XLA fuses
    them into whatever consumes the channels, so deriving only the final
    shaded image from ``packed`` never materializes the planar stacks.
    """
    n_out = _out_stripes(n_attrs)
    h_pad = packed.shape[0]
    ntx = packed.shape[1] // (n_out * tile_w)
    s = packed.reshape(h_pad, ntx, n_out, tile_w)
    return [s[:, :, c, :].reshape(h_pad, ntx * tile_w)
            for c in range(min(n_out, 7))]


def _gbuffers_from_packed(packed, config: RenderConfig, tile_h: int,
                          tile_w: int, n_attrs: int, n_views: int = 1,
                          rows_per_view: int = 0):
    """(color, z, normal) planar stacks from a packed stripe G-buffer.

    ``rows_per_view`` is the per-view tile-row stride for view-batched
    buffers (``view_row_stride``); 0/1 view → plain [:h, :w] crop. With
    ``n_attrs == 3`` (fast-shade) the normal stack is zeros.
    """
    h, w = config.height, config.width
    chans = unpack_channels(packed, tile_h, tile_w, n_attrs)

    def crop(c):
        if n_views == 1:
            return c[:h, :w]
        return c.reshape(n_views, rows_per_view * tile_h, -1)[:, :h, :w]

    cb, cg, cr, z_img = chans[:4]
    color = jnp.stack([crop(cb), crop(cg), crop(cr)], axis=-1)
    if n_attrs == binning.N_ATTRS:
        nx, ny, nz = chans[4:7]
        normal = jnp.stack([crop(nx), crop(ny), crop(nz)], axis=-1)
    else:
        normal = jnp.zeros_like(color)
    return color, crop(z_img)[..., None], normal


def _stacked_tile_rows(config: RenderConfig, tile_h: int, group: int,
                       n_views: int, rows_per_view: int) -> int:
    """Tile-row count of the (possibly view-stacked) grouped bin grid —
    must mirror ``_stage_b``'s padding exactly."""
    nty = -(-config.height // tile_h)
    if n_views > 1:
        return n_views * rows_per_view
    return -(-nty // group) * group


def _pos_of_tiles(stids, n_tiles: int, interpret: bool = False):
    """Inverse of the count-sorted composition: sorted position per tile.

    Computed by a SECOND small bitonic key sort — ``(stid << b) | k`` sorted
    ascending puts tile t's packed position at slot t (every real tile
    appears exactly once; sentinels sort to the tail) — instead of a
    scatter: XLA lowers a 1-D scatter as a serial per-element loop, which
    measured ~0.3 ms for the 2048-tile grid (the cumulative-chain probe's
    raster→assemble delta), vs ~0.035 ms for the sort.
    """
    from .sort_pallas import bitonic_sort_i32

    n_sorted = stids.shape[0]
    bits = max((n_sorted - 1).bit_length(), 1)
    assert n_tiles < (1 << (31 - bits)), "tile/position key would overflow"
    key = (stids << bits) | jnp.arange(n_sorted, dtype=jnp.int32)
    skey = bitonic_sort_i32(key, interpret=interpret)
    return (skey & ((1 << bits) - 1))[:n_tiles]


def _grouped_tile_blocks(gpacked, stids, config: RenderConfig, tile_w: int,
                         group: int, n_planes: int, nty_g: int):
    """Gather per-tile (n_planes, TH, TW) blocks from a group-packed array.

    ``gpacked``: (n_groups, TH, TW, K) — lane ``s + group*p`` holds plane p
    of the tile at sorted position ``g*group + s``. Returns
    (n_tiles, n_planes, TH, TW) in tile-grid order.
    """
    n_groups, th, tw, chunk = gpacked.shape
    sub = chunk // group
    ntx = -(-config.width // tile_w)
    n_tiles = ntx * nty_g
    n_sorted = n_groups * group
    # lane = s + group*p  →  reshape minor 128 to (sub, group) = [p, s]
    q = gpacked.reshape(n_groups, th, tw, sub, group)[..., :n_planes, :]
    qq = q.transpose(0, 4, 3, 1, 2).reshape(n_sorted, n_planes, th, tw)
    pos = _pos_of_tiles(stids, n_tiles)
    blocks = qq[pos]
    if n_sorted < stids.shape[0]:
        # live-group compaction: tiles sorted past the live grid read the
        # background (z plane = z_init, everything else 0)
        bg = jnp.where(
            jnp.arange(n_planes, dtype=jnp.int32)[:, None, None] == 3,
            jnp.float32(config.z_init), 0.0)
        blocks = jnp.where((pos < n_sorted)[:, None, None, None], blocks, bg)
    return blocks


def _gbuffers_from_grouped(gpacked, stids, config: RenderConfig,
                           tile_h: int, tile_w: int, n_attrs: int,
                           group: int, n_views: int = 1,
                           rows_per_view: int = 0):
    """(color, z, normal) planar stacks from a GROUP-PACKED G-buffer.

    The lazy (getter-time) unpack: one gather by ``stids`` + layout
    transposes — bit-exact (the packed buffer IS the G-buffer data). The
    hot path never runs this: ``post`` images quantize in-kernel and
    gather only bytes (``assemble_u8_image``).
    """
    h, w = config.height, config.width
    n_out = _out_stripes(n_attrs)
    n_planes = min(n_out, 7)
    nty_g = _stacked_tile_rows(config, tile_h, group, n_views, rows_per_view)
    ntx = -(-w // tile_w)
    blocks = _grouped_tile_blocks(gpacked, stids, config, tile_w, group,
                                  n_planes, nty_g)
    img = blocks.reshape(nty_g, ntx, n_planes, tile_h, tile_w) \
        .transpose(2, 0, 3, 1, 4).reshape(n_planes, nty_g * tile_h,
                                          ntx * tile_w)
    chans = [img[c] for c in range(n_planes)]

    def crop(c):
        if n_views == 1:
            return c[:h, :w]
        return c.reshape(n_views, rows_per_view * tile_h, -1)[:, :h, :w]

    cb, cg, cr, z_img = chans[:4]
    color = jnp.stack([crop(cb), crop(cg), crop(cr)], axis=-1)
    if n_attrs == binning.N_ATTRS:
        nx, ny, nz = chans[4:7]
        normal = jnp.stack([crop(nx), crop(ny), crop(nz)], axis=-1)
    else:
        normal = jnp.zeros_like(color)
    return color, crop(z_img)[..., None], normal


def assemble_u8_image(u8packed, stids, config: RenderConfig,
                      tile_h: int = TILE_H, tile_w: int = TILE_W,
                      group: int = GROUP, n_views: int = 1,
                      rows_per_view: int = 0):
    """(H, W, 3) uint8 image from the kernel's group-packed u8 output.

    The HOT post-image path: the kernel already shaded/quantized, so this
    moves only bytes. The deinterleave runs in the INT32 domain — bitcast
    four adjacent u8 lanes into one word (lanes 4k..4k+3 share one plane
    class whenever ``group % 4 == 0``), row-gather each tile's three
    channel words, and extract the tile's byte with a per-tile shift —
    u8-dtype transposes at byte granularity measured ~2x the i32 path.
    """
    h, w = config.height, config.width
    assert group % 4 == 0 and group >= 4, \
        "i32-word deinterleave needs 4 u8 lanes per plane class"
    nty_g = _stacked_tile_rows(config, tile_h, group, n_views, rows_per_view)
    ntx = -(-w // tile_w)
    n_tiles = ntx * nty_g
    n_groups, th, tw, chunk = u8packed.shape
    if u8packed.dtype == jnp.int32:
        # packed-BGR word blocks (pack_bgr kernels): every lane already
        # holds its stripe's full BGR0 pixel word, so assembly is a lane
        # slice (one word per stripe) + one row gather by sorted position +
        # the aligned spatial transpose — no byte deinterleave anywhere
        sl = u8packed[..., :group]                     # (G, th, tw, group)
        vt = sl.transpose(0, 3, 1, 2).reshape(n_groups * group, th, tw)
        pos = _pos_of_tiles(stids, n_tiles)
        w3 = vt[jnp.minimum(pos, n_groups * group - 1)]
        if n_groups * group < stids.shape[0]:
            # live-group compaction: dead tiles are background (zeros)
            w3 = jnp.where((pos < n_groups * group)[:, None, None], w3, 0)
        wimg = w3.reshape(nty_g, ntx, tile_h, tile_w).transpose(0, 2, 1, 3) \
            .reshape(nty_g * tile_h, ntx * tile_w)
        img = jax.lax.bitcast_convert_type(wimg, jnp.uint8)[..., :3]
        if n_views == 1:
            return img[:h, :w]
        return img.reshape(n_views, rows_per_view * tile_h, -1, 3)[:, :h, :w]
    nw = chunk // 4                      # i32 words per lane row
    # word k = lanes 4k..4k+3 (little-endian byte j = lane 4k+j): channel
    # p of stripe s lives at word p*(group//4) + s//4, byte s%4
    v32 = jax.lax.bitcast_convert_type(
        u8packed.reshape(n_groups, th, tw, nw, 4), jnp.int32)
    vt = v32.transpose(0, 3, 1, 2).reshape(n_groups * nw, th, tw)
    pos = _pos_of_tiles(stids, n_tiles)
    g = pos // group
    s = pos % group
    base = g * nw + s // 4
    idx = (base[:, None]
           + jnp.arange(3, dtype=jnp.int32)[None, :] * (group // 4))
    words = vt[idx.reshape(-1)].reshape(n_tiles, 3, th, tw)
    shift = ((s % 4) * 8)[:, None, None, None]
    ch = (words >> shift) & 255
    if n_groups * group < stids.shape[0]:
        # live-group compaction: tiles sorted past the live grid have no
        # block — their image region is the (all-zero) u8 background (the
        # gather above clamps out-of-range rows; mask the garbage out)
        ch = jnp.where((g < n_groups)[:, None, None, None], ch, 0)
    # Stay in the INT32 domain through the spatial interleave: pack each
    # pixel's three bytes into one BGR0 word, tile-interleave with an
    # ALIGNED i32 transpose (minor dims ntx*tw — multiples of 128 lanes),
    # bitcast to (H, W, 4) u8 and slice off the pad byte. The u8-domain
    # variant (transpose with a 3-byte minor dim) measured 0.298 vs 0.203
    # ms on T-Rex under live-group compaction — the 3-minor transpose is
    # the single most expensive op of the whole assembly. (An earlier
    # round measured the i32 variant slower at full 128-group shapes; the
    # verdict flipped with compaction — see PERF_NOTES.)
    w3 = ch[:, 0] | (ch[:, 1] << 8) | (ch[:, 2] << 16)   # (n_tiles, th, tw)
    wimg = w3.reshape(nty_g, ntx, tile_h, tile_w).transpose(0, 2, 1, 3) \
        .reshape(nty_g * tile_h, ntx * tile_w)
    img = jax.lax.bitcast_convert_type(wimg, jnp.uint8)[..., :3]
    if n_views == 1:
        return img[:h, :w]
    return img.reshape(n_views, rows_per_view * tile_h, -1, 3)[:, :h, :w]


@functools.partial(jax.jit, static_argnames=(
    "config", "tile_h", "tile_w", "n_attrs", "n_views", "rows_per_view",
    "group"))
def unpack_gbuffers(packed, config: RenderConfig,
                    tile_h: int = TILE_H, tile_w: int = TILE_W,
                    n_attrs: int = binning.N_ATTRS, n_views: int = 1,
                    rows_per_view: int = 0, group: int = GROUP):
    """Jitted lazy G-buffer derivation used by the filler when a frame was
    dispatched packed-only (``render_frame`` with ``packed_out=True``).
    Bit-exact: the packed buffer IS the G-buffer data. Dispatches on the
    packed container: a ``(gpacked, stids)`` tuple is the grouped kernel's
    group-packed format; a bare 2-D array is the flat lane-stripe format of
    the un-grouped fallback kernel (and the empty-scene background)."""
    if isinstance(packed, (tuple, list)):
        gpacked, stids = packed
        return _gbuffers_from_grouped(gpacked, stids, config, tile_h,
                                      tile_w, n_attrs, group, n_views,
                                      rows_per_view)
    return _gbuffers_from_packed(packed, config, tile_h, tile_w, n_attrs,
                                 n_views, rows_per_view)


def packed_background(config: RenderConfig, tile_h: int = TILE_H,
                      tile_w: int = TILE_W,
                      n_attrs: int = binning.N_ATTRS):
    """Empty-scene packed buffer (z stripes = z_init, everything else 0)."""
    n_out = _out_stripes(n_attrs)
    ntx = -(-config.width // tile_w)
    nty = -(-config.height // tile_h)
    col = jnp.arange(ntx * n_out * tile_w, dtype=jnp.int32)
    return jnp.broadcast_to(
        jnp.where((col // tile_w) % n_out == 3, jnp.float32(config.z_init),
                  0.0),
        (nty * tile_h, ntx * n_out * tile_w))


def _stage_b(rows, tx0, cx, ty0, cy, counts,
             config: RenderConfig, p_cap: int, grid_cap: int,
             tile_h: int, tile_w: int, chunk: int, interpret: bool,
             group: int = 1, n_attrs: int = binning.N_ATTRS,
             sign_cover: bool = False, n_views: int = 1,
             packed_out: bool = False, post: str = "none", light=None,
             emit_gbuf: bool = True, bin_reject: bool = False,
             g_cap: int = 0):
    """Bin → Pallas raster.

    Returns (out, n_active, cap_used, post_img) where ``cap_used`` is
    the quantity the static ``p_cap`` must cover (triangle→tile pairs for
    ``group == 1``, interleaved slots for grouped mode). With
    ``n_attrs == 3`` (fast-shade mode) the normal G-buffer is zeros.

    ``post`` ("none" | "u8" | "lambert_u8" | "fast_lambert_u8"): on the
    grouped path the final image shades/quantizes IN-KERNEL and
    ``post_img`` is the assembled (H, W, 3) uint8 image ((V, H, W, 3) view-
    batched); on the un-grouped fallback ``post_img`` is None and the
    caller derives the image XLA-side from the G-buffers.

    ``packed_out=True`` returns the raw packed G-buffer instead of the
    planar (color, z, normal) stacks — the hot path for callers that only
    need the final shaded image. Grouped format: the ``(gpacked, stids)``
    tuple (see ``_raster_tiles_grouped``); un-grouped: the flat lane-stripe
    image. G-buffers come lazily from ``unpack_gbuffers`` (bit-exact).

    VIEW BATCHING (``n_views > 1``): the inputs carry several views'
    triangles concatenated, with each view's tile rows offset by
    ``view * nty_g`` (``nty_g`` = the per-view tile-row count padded to a
    multiple of ``group`` — ``view_row_stride`` gives callers the exact
    value) — the views render as one vertically stacked image through ONE
    kernel launch, sharing the sort/binning glue and letting count-sorted
    grouping balance stripes ACROSS views. Plane rows stay view-relative
    (the kernels evaluate pixel coordinates from the local tile position),
    so each view's pixels are BIT-IDENTICAL to its single-view render.
    The returned G-buffers gain a leading ``(n_views,)`` axis.
    """
    h, w = config.height, config.width
    ntx = -(-w // tile_w)
    nty = -(-h // tile_h)
    n_tiles = ntx * nty
    del grid_cap  # grid compaction regressed perf; kept for API stability
    if n_views > 1:
        # both paths use the grouped padding convention for the view
        # offsets (the caller laid tile rows out at view * nty_g)
        nty_g1 = view_row_stride(nty, group)
        nty = n_views * nty_g1
        n_tiles = ntx * nty
    else:
        nty_g1 = nty

    if group > 1:
        from .binsort_pallas import grouped_limits_ok

        # Graceful degrade: the packed grouped binner has static bit
        # budgets (17b triangle / 14b tile / 6b span / 17b slots). A
        # workload past them — a >131k-triangle mesh, an image wider than
        # 63 tiles (63·tile_w px; 2016 px at the default tile_w=32), or an
        # overflow-recovery capacity grown past 131k slots —
        # falls back to the un-grouped path (sorted bins + the one-tile
        # kernel), which is slower but has no packing limits. Without
        # this, capacity auto-recovery itself could trip an assert.
        if not grouped_limits_ok(tx0.shape[0], p_cap,
                                 ntx, -(-nty // group) * group):
            group = 1

    if group > 1:
        from .binsort_pallas import bin_gather_grouped

        nty_g = -(-nty // group) * group
        # sorted-gather binning (bitonic key sort + vectorized interleave):
        # rows pre-trimmed to the live columns (12 planes + bbox + attr
        # coefs) — ~47% less row-gather traffic than 64-wide rows
        (binned, gstarts, gchunks, stids, sstripes, tile_counts, total_slots,
         n_active) = \
            bin_gather_grouped(rows[:, :_rows_used(n_attrs)], tx0, cx, ty0,
                               cy, ntx=ntx, nty=nty_g, slot_cap=p_cap,
                               group=group, sub=chunk // group,
                               interpret=interpret,
                               # per-pair trivial-reject: OPT-IN via
                               # bin_reject (measured a net wall LOSS on
                               # T-Rex — the coef gather + searchsorted
                               # counting cost more than the 6-9% slot cut
                               # saves; see PERF_NOTES)
                               tile_h=tile_h if bin_reject else 0,
                               tile_w=tile_w if bin_reject else 0,
                               tiles_per_view=(ntx * nty_g1
                                               if n_views > 1 else 0))
        # pre-shaded posts ("u8"/"fast_lambert_u8") only quantize in-kernel;
        # "lambert_u8" also shades there (needs the 6-attr normal planes)
        kpost = None if post == "none" else (
            "lambert_u8" if post == "lambert_u8" else "u8")
        gpacked, u8blocks = _raster_tiles_grouped(
            binned, gstarts, gchunks, stids, sstripes, ntx, nty_g,
            tile_h, tile_w, chunk, group, config.z_init, interpret, n_attrs,
            sign_cover,
            tiles_per_view=ntx * nty_g1 if n_views > 1 else 0,
            post=kpost, light=light,
            emit_gbuf=emit_gbuf or kpost is None or not packed_out,
            g_cap=g_cap)
        cap_used = total_slots
        rows_pv = nty_g1 if n_views > 1 else 0
        post_img = None
        if u8blocks is not None:
            post_img = assemble_u8_image(u8blocks, stids, config, tile_h,
                                         tile_w, group, n_views, rows_pv)
        if packed_out:
            packed = (gpacked, stids) if gpacked is not None else None
            return packed, n_active, cap_used, post_img
        gbuf = _gbuffers_from_grouped(gpacked, stids, config, tile_h,
                                      tile_w, n_attrs, group, n_views,
                                      rows_pv)
        return gbuf, n_active, cap_used, post_img
    else:
        from .binsort_pallas import SMEM_PLACEMENT_SLOT_LIMIT

        # bin_pairs (pure XLA, bitonic sort) whenever the Pallas placement
        # kernel can't run: interpret mode, unaligned shapes, or a capacity
        # past its SMEM output budget — the un-grouped path IS the degrade
        # target for >2^17-slot workloads, so it must never hit bin_sort's
        # own SMEM wall (a measured compile failure at 458k slots).
        if (interpret or n_tiles % 128 != 0 or p_cap % 128 != 0
                or p_cap > SMEM_PLACEMENT_SLOT_LIMIT):
            binned, tile_starts, tile_counts = binning.bin_pairs(
                rows, tx0, cx, ty0, cy, counts, p_cap, ntx, nty, chunk)
            n_active = jnp.sum((tile_counts > 0).astype(jnp.int32))
        else:
            binned, tile_starts, tile_counts, n_active = \
                binning.bin_pairs_fast(rows, tx0, cx, ty0, cy, p_cap,
                                       ntx, nty, chunk)
        packed = _raster_tiles(
            binned, tile_starts, tile_counts, p_cap,
            ntx, nty, tile_h, tile_w, chunk, config.z_init, interpret,
            n_attrs, sign_cover,
            tiles_per_view=ntx * nty_g1 if n_views > 1 else 0)
        cap_used = jnp.sum(counts)

    if packed_out:
        return packed, n_active, cap_used, None
    gbuf = _gbuffers_from_packed(packed, config, tile_h, tile_w, n_attrs,
                                 n_views, nty_g1 if n_views > 1 else 0)
    return gbuf, n_active, cap_used, None


@functools.partial(jax.jit, static_argnames=(
    "config", "tile_h", "tile_w", "chunk", "group"))
def grouped_slot_total(tris_screen, active, config: RenderConfig,
                       tile_h: int = TILE_H, tile_w: int = TILE_W, chunk: int = 128,
                       group: int = GROUP):
    """Slot count a grouped frame needs (device scalar; one sizing sync).

    Sizing MUST mirror ``_stage_b``'s dispatch decision: a workload past
    the packed grouped binner's static budgets degrades there to the
    un-grouped path, whose capacity demand is the raw pair count — so this
    returns the pair total for such workloads instead of feeding an
    over-budget geometry into ``group_histogram`` (whose packed sort key
    would silently corrupt at >= 2^14 tiles).
    """
    from .binsort_pallas import group_histogram, grouped_limits_ok

    sub = chunk // group
    _rows, tx0, cx, ty0, cy, counts = binning.plane_data(
        tris_screen, active, config, tile_h, tile_w)
    ntx = -(-config.width // tile_w)
    nty = -(-config.height // tile_h)
    nty_g = -(-nty // group) * group
    t = int(tx0.shape[0])
    # slot_cap=0: the capacity budget can't be checked before the capacity
    # exists — _stage_b re-checks with the real bucket at dispatch
    if not grouped_limits_ok(t, 0, ntx, nty_g):
        return jnp.sum(counts)        # un-grouped path's demand
    _tile_counts, _stids, _sstripes, gchunks = group_histogram(
        tx0, cx, ty0, cy, ntx, nty_g, group, sub)
    return 128 * jnp.sum(gchunks)


@functools.partial(jax.jit, static_argnames=(
    "config", "tile_h", "tile_w", "chunk", "group"))
def grouped_frame_demand(tris_screen, active, config: RenderConfig,
                         tile_h: int = TILE_H, tile_w: int = TILE_W,
                         chunk: int = 128, group: int = GROUP):
    """(slot demand, nonempty-tile count) for a grouped frame.

    One sizing dispatch reads BOTH scalars: the slot demand sizes the
    static pair capacity (``grouped_slot_total`` semantics, including the
    un-grouped degrade mirror) and the nonempty-tile count sizes LIVE-GROUP
    GRID COMPACTION (``render_frame``'s ``g_cap`` — live groups =
    ``ceil(n_active / group)`` because the count-sorted composition packs
    all nonempty tiles into the leading sorted positions). The tile count
    is 0 for workloads that degrade to the un-grouped path (no grouped
    grid to compact).
    """
    from .binsort_pallas import group_histogram, grouped_limits_ok

    sub = chunk // group
    _rows, tx0, cx, ty0, cy, counts = binning.plane_data(
        tris_screen, active, config, tile_h, tile_w)
    ntx = -(-config.width // tile_w)
    nty = -(-config.height // tile_h)
    nty_g = -(-nty // group) * group
    t = int(tx0.shape[0])
    if not grouped_limits_ok(t, 0, ntx, nty_g):
        return jnp.sum(counts), jnp.zeros((), jnp.int32)
    tile_counts, _stids, _sstripes, gchunks = group_histogram(
        tx0, cx, ty0, cy, ntx, nty_g, group, sub)
    n_active = jnp.sum((tile_counts > 0).astype(jnp.int32))
    return 128 * jnp.sum(gchunks), n_active


@functools.partial(jax.jit, static_argnames=(
    "config", "p_cap", "grid_cap", "tile_h", "tile_w", "chunk", "interpret",
    "group", "post", "sign_cover", "packed_out", "emit_gbuf", "g_cap"))
def render_frame(tri_verts, tri_norms, tri_colors,
                 config: RenderConfig, p_cap: int, grid_cap: int,
                 tile_h: int = TILE_H, tile_w: int = TILE_W, chunk: int = 128,
                 interpret: bool = False, group: int = 1,
                 post: str = "none", light=None, sign_cover: bool = False,
                 packed_out: bool = False, emit_gbuf: bool = True,
                 g_cap: int = 0):
    """Whole frame as ONE dispatch: geometry → bin → raster [→ shade].

    Per-dispatch overhead matters (over a remote-device tunnel it dominates),
    so the steady-state animation path is exactly one jitted call per frame
    with cached static capacities. Returns ((color, z, normal), cap_used,
    n_active_tiles[, post_image]) — the caller may (lazily) verify
    ``cap_used <= p_cap``.

    ``packed_out=True`` replaces the planar (color, z, normal) stacks in the
    return with the raw PACKED stripe G-buffer (the kernels' native output
    layout). The ``post`` image is then derived from ``packed`` inside the
    same fusion, so the ~28 MB of planar-stack materialization drops out of
    the hot path entirely; callers reconstruct exact planar G-buffers on
    demand with ``unpack_gbuffers(packed)`` (bit-identical — the packed
    buffer IS the G-buffer data). This is the steady-state animation mode:
    a frame's deliverable is its shaded image, the G-buffers are
    device-resident state read only when someone asks.

    ``post`` fuses the final-image pass into the same dispatch (the separate
    shade dispatch otherwise costs a second program launch per frame over
    the tunnel): ``"u8"`` appends the uint8-quantized color image,
    ``"lambert_u8"`` appends Lambert-shaded (``light`` = pre-negated
    normalized direction) uint8 color.

    ``post="fast_lambert_u8"`` is the opt-in FAST-SHADE mode: Lambert is
    evaluated per VERTEX and baked into the color attribute planes (classic
    Gouraud), so the kernel carries 3 attribute channels instead of 6 —
    ~30% less chunk arithmetic and half the G-buffer output traffic. The
    depth buffer is bit-identical to the exact mode (same geometry planes);
    the shaded image differs from the reference's per-pixel-normal Lambert
    only by the interpolation order (values interpolated after shading vs
    shaded after interpolation), and the returned normal G-buffer is zeros.
    The default path is unchanged — fast mode only runs when explicitly
    requested (reference analogue: Version A→C trades generality for the
    hot path, README.md:25-46).

    ``sign_cover=True`` is a second, independent opt-in: the full
    nine-term candidate predicate (λ coverage, bbox, z-range) folds into
    one OR-of-bit-patterns sign test (see ``_good_mask``) — ~7% less
    chunk-loop ALU — but pixels whose λ evaluates to -0.0
    (exactly-on-edge centers) flip, so it is NOT reference-exact and is
    off by default.

    ``emit_gbuf=False`` (legal only with ``packed_out=True`` and a ``post``
    mode, grouped path): the kernel skips the f32 G-buffer output entirely
    — the frame's only product is the post image (~64 MB less HBM write
    traffic per 1024² frame). The packed slot of the return is then None;
    callers needing G-buffers later re-render with ``emit_gbuf=True``
    (bit-identical — the kernel is deterministic), which is what
    ``AdvancedPixelBufferFiller`` does lazily on getter access.

    ``g_cap`` (static, grouped path): LIVE-GROUP GRID COMPACTION — bound
    the Pallas grid and outputs to the first ``g_cap`` count-sorted groups
    (nonempty groups are a prefix of the group order). Size it as
    ``ceil(n_active / group)`` plus headroom (``grouped_frame_demand``
    returns ``n_active`` alongside the slot demand); a frame whose
    nonempty-tile count exceeds ``g_cap * group`` renders its smallest
    tiles as background — detect via the returned ``n_active`` and
    re-render at a grown cap (the filler's overflow loop does). 0 = full
    grid.
    """
    from .illumination import lambert_shade
    from .projection import project_to_screen, visibility_masks

    fast = post == "fast_lambert_u8"
    # LEAN u8 frames: a plain-quantize hot frame (post="u8", no G-buffer
    # output) reads only the B, G, R planes — carrying the three normal
    # channels through the chunk loop, the DMA rows, and the epilogue
    # doubling is dead weight. Same kernel math for the live channels, so
    # the u8 image is bit-identical; getters re-render with the full six
    # channels anyway (the deferred-materialize path).
    lean = post == "u8" and packed_out and not emit_gbuf
    n_attrs = 3 if (fast or lean) else binning.N_ATTRS
    post_img = None
    if tri_verts.shape[0] == 0:   # empty scene → background
        zero = jnp.zeros((), jnp.int32)
        # a lean frame's packed slot is normally None (deferred); the empty
        # scene is cheap enough to hand back a REAL packed background — but
        # it must then carry the full N_ATTRS layout, because deferred-frame
        # consumers unpack lean frames at the full attribute count
        bg_attrs = binning.N_ATTRS if lean else n_attrs
        out = (packed_background(config, tile_h, tile_w, bg_attrs)
               if packed_out else _background(config))
        if post == "none":
            return out, zero, zero
        img = jnp.zeros((config.height, config.width, 3), jnp.uint8)
        return out, zero, zero, img
    degenerate, backfacing = visibility_masks(tri_verts, tri_norms)
    active = jnp.logical_and(~degenerate, ~backfacing)
    tris_screen = project_to_screen(tri_verts, config)
    if fast:
        # per-vertex Lambert shade baked into the colors (Gouraud) —
        # the same shared definition the deferred pass uses, applied to
        # (T, 3, 3) per-vertex normals instead of the G-buffer
        attr_colors, attr_normals = lambert_shade(tri_colors, tri_norms,
                                                  light), None
    elif lean:
        attr_colors, attr_normals = tri_colors, None
    else:
        attr_colors, attr_normals = tri_colors, tri_norms
    rows, tx0, cx, ty0, cy, counts, _total = _plane_stage(
        tris_screen, attr_colors, attr_normals, active, config, tile_h,
        tile_w)
    out, n_active, cap_used, post_img = _stage_b(
        rows, tx0, cx, ty0, cy, counts, config, p_cap, grid_cap,
        tile_h, tile_w, chunk, interpret, group, n_attrs, sign_cover,
        packed_out=packed_out, post=post, light=light,
        emit_gbuf=emit_gbuf, g_cap=g_cap)
    if post == "none":
        return out, cap_used, n_active
    if post_img is not None:   # grouped path: shaded/quantized in-kernel
        return out, cap_used, n_active, post_img
    if packed_out:
        # un-grouped fallback: derive the post image from the packed
        # stripes — XLA fuses the unpack into the shade/quantize and DCEs
        # the unread channels, so the planar stacks never materialize
        color, _z, normal = _gbuffers_from_packed(out, config, tile_h,
                                                  tile_w, n_attrs)
    else:
        color, _z, normal = out
    if post == "lambert_u8":
        img = lambert_shade(color, normal, light).astype(jnp.uint8)
    else:   # "u8" or fast mode (colors already shaded per-vertex)
        img = color.astype(jnp.uint8)
    return out, cap_used, n_active, img


def _background(config: RenderConfig):
    h, w = config.height, config.width
    return (jnp.zeros((h, w, 3), jnp.float32),
            jnp.full((h, w, 1), config.z_init, jnp.float32),
            jnp.zeros((h, w, 3), jnp.float32))


def rasterize(tris_screen: jnp.ndarray,
              colors: jnp.ndarray,
              normals: jnp.ndarray,
              active: jnp.ndarray,
              config: RenderConfig,
              tile_h: int = TILE_H, tile_w: int = TILE_W, chunk: int = 128,
              interpret: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rasterize projected triangles into (color, z, normal) G-buffers.

    Drop-in equivalent of ``raster_ref.rasterize`` (same semantics: ceil
    bbox, λ≥0 coverage, z∈[0,1], strict-< depth with first-writer ties);
    differs only in float rounding at triangle edges (plane-form λ vs the
    reference's ratio form). Performs one host sync to size the bins; use
    ``render_frame`` with a cached ``p_cap`` for sync-free animation.
    """
    if tris_screen.shape[0] == 0:   # empty scene → background
        return _background(config)

    rows, tx0, cx, ty0, cy, counts, total = _stage_a(
        tris_screen, colors, normals, active, config, tile_h, tile_w)
    p_cap = binning.capacity_bucket(int(total), chunk)
    ntx = -(-config.width // tile_w)
    nty = -(-config.height // tile_h)
    out, _n_active, _used, _pimg = _stage_b_jit(
        rows, tx0, cx, ty0, cy, counts, config=config, p_cap=p_cap,
        grid_cap=ntx * nty, tile_h=tile_h, tile_w=tile_w, chunk=chunk,
        interpret=interpret)
    return out


_stage_b_jit = jax.jit(_stage_b, static_argnames=(
    "config", "p_cap", "grid_cap", "tile_h", "tile_w", "chunk", "interpret",
    "group", "n_attrs", "sign_cover", "n_views", "packed_out", "post",
    "emit_gbuf", "bin_reject", "g_cap"))
