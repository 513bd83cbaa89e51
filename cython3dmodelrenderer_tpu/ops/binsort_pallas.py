"""Pallas counting-sort binning — replaces XLA's bitonic sort.

XLA lowers the pair sort in ``binning.bin_pairs`` to a bitonic-network while
loop (O(P log² P) vector passes); counting sort is O(P) and splits cleanly
across the TPU's units:

* **histogram + scan stay in XLA**: per-tile pair counts are a separable
  membership matmul ``myᵀ @ mx`` over (T, n_tiles_y/x) masks — exact in f32
  on the MXU — and bin starts are one tiny cumsum;
* **placement runs here**: walk the (triangle, tile) pairs in ascending
  triangle order, emitting each triangle's index at its tile's bin cursor
  (SMEM scalar loop). Ascending order per tile is exactly the stable order
  the depth-tie rule needs.

The production grouped path is ``bin_gather_grouped``: it materializes
the pair list XLA-side (scatter+cummax fill-forwards expand the
per-triangle tile spans into one packed int32 per pair), sorts the packed
keys with the Pallas bitonic network (``sort_pallas``), and builds the
group-interleaved layout with pure vector index math — no scalar loop at
all. ``bin_sort_grouped`` keeps the earlier scalar cursor-chain placement
kernel as the equivalence oracle (same tables always; bit-identical
render at ample capacity — under overflow the two clamp differently, see
``bin_gather_grouped``). The
one-tile-per-step path (``bin_sort``) still iterates (tx0, cx, ty0, cy)
spans directly with a single-tile fast path. Unplaced capacity slots are left uninitialized and
clamped by the caller into valid row indices — safe because plane_data
zeroes culled rows' bboxes (SAFETY INVARIANT there), so any row that can
cover a pixel is already in that pixel's bin at an earlier rank. Scalar
stores must target SMEM, and SMEM output windows pad each row to 512
bytes — hence the (N/128, 128) output shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(t: int, n_tiles: int, ntx: int, p_cap: int):
    def kernel(tx0_ref, cx_ref, ty0_ref, cy_ref, starts_ref, total_ref,
               order_ref, cursors):
        del total_ref
        # cursors: SMEM scratch (n_tiles,) initialized from the bin starts.
        def init(i, _):
            cursors[i] = starts_ref[i]
            return 0

        jax.lax.fori_loop(0, n_tiles, init, 0)

        # Capacity slots beyond the placed pairs stay UNINITIALIZED: the
        # caller clamps the permutation, so stale slots gather some real
        # row — harmless because plane_data zeroes the bbox of culled rows
        # (SAFETY INVARIANT there): any row that can cover a pixel is in
        # that pixel's own bin at an earlier rank, so it either duplicates
        # a legit entry (losing the tie to the earlier lane) or fails the
        # bbox test. The rendered output is identical either way.

        # Placement in ascending triangle order (stable per tile).
        def place(tri, _):
            cx = cx_ref[tri]
            cy = cy_ref[tri]
            base = ty0_ref[tri] * ntx + tx0_ref[tri]

            @pl.when(cx * cy == 1)
            def _():          # fast path: single-tile triangle
                pos = cursors[base]

                @pl.when(pos < p_cap)
                def _():
                    order_ref[pos // 128, pos % 128] = tri

                cursors[base] = pos + 1

            @pl.when((cx * cy != 1) & (cx * cy > 0))
            def _():

                def over_y(dy, _):
                    row0 = base + dy * ntx

                    def over_x(dx, _):
                        tile = row0 + dx
                        pos = cursors[tile]

                        @pl.when(pos < p_cap)
                        def _():
                            order_ref[pos // 128, pos % 128] = tri

                        cursors[tile] = pos + 1
                        return 0

                    jax.lax.fori_loop(0, cx, over_x, 0)
                    return 0

                jax.lax.fori_loop(0, cy, over_y, 0)

            return 0

        jax.lax.fori_loop(0, t, place, 0)

    return kernel


def _make_group_kernel(n_tiles: int, n_sorted: int, group: int, sub: int,
                       unroll: int = 8):
    # The (triangle, tile) pair list is fully enumerated XLA-side (see
    # bin_sort_grouped) as one packed int32 per pair: bits [0:14] = tile,
    # [14:] = triangle index. The scalar loop is a BRANCHLESS emit per pair
    # (one SMEM read, cursor bump, bounded store), unrolled ``unroll``x to
    # amortize fori_loop overhead (~a third of the per-emit cost). The tail
    # past the true pair count holds sentinel pairs targeting the virtual
    # tile ``n_tiles`` whose bound is 0, so overrun emits are dropped by the
    # regular bound guard.
    def kernel(pairs_ref, np_ref, gstarts_ref, stids_ref,
               order_ref, cursors, bases, bounds, blocks):
        # Per-tile slot base (group start + stripe offset), group bound, and
        # group chunk count, precomputed once so the hot emit path does two
        # fewer SMEM reads and no group-index arithmetic. Groups are
        # COMPOSED of count-sorted tiles (stids = tile id at each sorted
        # position): sorted position k maps to group k//group, stripe
        # k%group. Entry n_tiles is the sentinel: base 0, bound 0 (nothing
        # ever stores through it; blocks 1 keeps its divisions defined).
        def init(k, _):
            tile = stids_ref[k]
            g = k // group
            cursors[tile] = 0
            bases[tile] = gstarts_ref[g] + (k % group)
            bounds[tile] = gstarts_ref[g + 1]
            blocks[tile] = jnp.maximum(
                (gstarts_ref[g + 1] - gstarts_ref[g]) // (group * sub), 1)
            return 0

        jax.lax.fori_loop(0, n_sorted, init, 0)
        cursors[n_tiles] = 0
        bases[n_tiles] = 0
        bounds[n_tiles] = 0
        blocks[n_tiles] = 1

        # Unplaced slots stay uninitialized — they clamp to arbitrary row
        # indices downstream, which is safe because plane_data zeroes the
        # bbox of culled rows (see the SAFETY INVARIANT there): any row that
        # can cover a pixel is in that pixel's own bin at an earlier rank.

        # STRIDED lane-class placement into group-interleaved slots: stripe
        # s owns lane class {s, s+group, ...}; within the class, class-lane
        # m = r // b holds the contiguous rank block [m*B, (m+1)*B) where B
        # is the group's chunk count — lane order == rank order, so the
        # raster epilogue breaks z ties by MIN LANE with no rank channel,
        # and the class structure is invariant under lane rolls by
        # multiples of ``group`` (the epilogue's unmasked roll-doubling).
        def emit(i):
            p = pairs_ref[i]
            tile = p & ((1 << 14) - 1)
            tri = p >> 14
            r = cursors[tile]
            b = blocks[tile]
            pos = bases[tile] + (r % b) * (group * sub) + (r // b) * group

            # bound by the group's own (capacity-clamped) allocation so an
            # overflowing group can never stomp its neighbor's slots; the
            # r < b*sub guard matters under the lane-block layout — an
            # overflowed rank would wrap into a NEIGHBOR STRIPE's lanes
            # (r // b >= sub) while staying under the group bound
            @pl.when((pos < bounds[tile]) & (r < b * sub))
            def _():
                order_ref[pos // 128, pos % 128] = tri

            cursors[tile] = r + 1

        def place(i, _):
            for u in range(unroll):
                emit(i * unroll + u)
            return 0

        jax.lax.fori_loop(0, (np_ref[0] + unroll - 1) // unroll, place, 0)

    return kernel


def _expand_pairs(tx0, cx, ty0, cy, ntx: int, slot_cap: int):
    """Vectorized (triangle, tile) pair expansion, shared by both grouped
    binners (their outputs must stay bit-identical for the documented
    oracle equivalence — keep this the single copy).

    Enumerates ALL (triangle, tile) pairs XLA-side, in triangle order with
    each triangle's covered tiles in row-major (dy, dx) order — exactly the
    sequential order the depth-tie rule needs. Run expansion: scatter each
    active triangle's packed (index, base tile) to its run start (run
    starts = exclusive cumsum of per-triangle pair counts), then fill
    forward with a cummax — valid because every scattered word is strictly
    increasing in triangle order (run starts ascend by >= 1 per active
    triangle, so off<<6 dominates cx; the triangle index dominates the
    base tile). Two scatters total (XLA's 1D scatter is a serial loop, so
    each one matters — but do NOT replace the a_p ffill with
    ``((off << 6) | cx)[tri_p]``: that slot_cap-sized 1-D element gather
    measured ~0.13 ms/frame, twice the ffill it saves; see the element-
    gather note in ``bin_gather_grouped``).

    NOTE: (tri << 14) | tile reaches exactly INT32_MAX at the callers'
    asserted limits (tri = 2^17-1, tile = 2^14-1) — ZERO headroom. Widening
    either the 17b triangle or 14b tile budget overflows int32 to negative
    and silently breaks the cummax fill-forward; re-derive the bound first.

    Returns (tri_p, tile_p, n_pairs, total_pairs): slot i < n_pairs holds
    the i-th pair's triangle id and tile id; slots >= n_pairs hold stale
    values the caller must mask with its own sentinel. ``total_pairs`` is
    the UNCLAMPED demand (> slot_cap signals expansion overflow — callers
    deriving capacity demand from the surviving pairs must fold it in, or
    a clamped expansion would silently under-report).
    """
    t = tx0.shape[0]
    act = (cx > 0) & (cy > 0)
    pc = jnp.where(act, cx * cy, 0)              # pairs per triangle
    off = jnp.cumsum(pc) - pc                    # run start per triangle
    total_pairs = off[-1] + pc[-1]
    n_pairs = jnp.minimum(total_pairs, slot_cap)
    tri_ids = jnp.arange(t, dtype=jnp.int32)
    startpos = jnp.where(act, off, slot_cap)     # inactive → dropped

    # ONE 2-column scatter for both fill-forward words: XLA lowers a 1-D
    # scatter as a serial per-update loop whose cost is the UPDATE COUNT
    # (measured 81 us per scatter on T-Rex — the largest single binning
    # cost), so scattering (1, 2) rows halves it vs two scalar scatters;
    # the cummax then fills both columns forward in one vector pass.
    # (A sorted scatter-MAX at the raw offsets — semantically equivalent,
    # indices_are_sorted=True — measured 121 us per ffill: TPU scatter-max
    # has no fast sorted path and the combiner costs extra. Do not retry.)
    vals2 = jnp.stack([(off << 6) | cx,                  # [0:6] cx, [6:] start
                       (tri_ids << 14) | (ty0 * ntx + tx0)],  # [0:14] base
                      axis=1)
    filled = jax.lax.cummax(
        jnp.zeros((slot_cap, 2), jnp.int32).at[startpos].set(
            vals2, mode="drop", unique_indices=True), axis=0)
    a_p, b_p = filled[:, 0], filled[:, 1]
    k = jnp.arange(slot_cap, dtype=jnp.int32) - (a_p >> 6)  # rank in run
    cx_p = a_p & 63
    dy = k // jnp.maximum(cx_p, 1)
    dx = k - dy * cx_p
    tile_p = (b_p & ((1 << 14) - 1)) + dy * ntx + dx
    return b_p >> 14, tile_p, n_pairs, total_pairs


def _clamp_group_chunks(gchunks, allowed: int):
    """CLAMP the cumulative chunk layout to the static capacity: on
    overflow, trailing groups lose chunks (missing geometry — detectable
    via ``total_slots > slot_cap``) but the raster kernel's DMA reads stay
    in bounds. Shared by both grouped binners (must agree bit-exactly).

    Returns (gchunks, gstarts, start_c, total_slots); ``gstarts`` has
    length n_groups + 1 in SLOTS — the extra tail entry (= total clamped
    chunks * 128) lets the raster kernel read the global chunk count for
    cross-group prefetch.
    """
    csum = jnp.cumsum(gchunks)
    # clamp before scaling to slots: at the bit-budget maxima (2048 groups
    # x 8192 chunks each) 128 * csum[-1] hits exactly 2^31 and would wrap
    # negative, silently defeating the cap_used > p_cap overflow check —
    # saturate instead (the clamped value still exceeds any valid p_cap)
    total_slots = 128 * jnp.minimum(csum[-1], (1 << 24) - 1)
    cum_c = jnp.minimum(csum.astype(jnp.int32), allowed)
    start_c = jnp.minimum(
        jnp.concatenate([jnp.zeros(1, jnp.int32),
                         csum[:-1].astype(jnp.int32)]), allowed)
    gchunks = cum_c - start_c
    gstarts = 128 * jnp.concatenate([start_c, cum_c[-1:]])
    return gchunks, gstarts, start_c, total_slots


def _compose_groups(tile_counts, n_tiles: int, group: int, sub: int,
                    interpret: bool = False):
    """Count-sorted group composition from per-tile pair counts.

    The exact code both binners must share (their tables are compared
    bit-for-bit by the equivalence oracle): sort tiles by descending stripe
    demand ``ceil(count/sub)``, ascending tile id within equal counts, and
    take consecutive ``group``-tuples. Returns (stids, sstripes, gchunks).
    """
    n_sorted = -(-n_tiles // group) * group
    stripes = (tile_counts + (sub - 1)) // sub               # (n_tiles,)
    # Packed single-operand sort: descending stripe count, ascending tile id
    # within equal counts (deterministic). stripes ≤ slot_cap < 2^17 for any
    # sub ≥ 1, and tile < 2^14; (inv << 14) | tile reaches exactly INT32_MAX
    # at those limits — zero headroom, same exact-fit as the pair packing
    # (re-derive the bound before widening either field).
    inv = ((1 << 17) - 1) - jnp.minimum(stripes, (1 << 17) - 1)
    key = (inv << 14) | jnp.arange(n_tiles, dtype=jnp.int32)
    # Pallas bitonic: XLA's lax.sort costs a measured ~0.11 ms even on the
    # 2k tile keys (vs ~0.035 ms); falls back to lax.sort off-TPU.
    from .sort_pallas import bitonic_sort_i32

    skey = bitonic_sort_i32(key, interpret=interpret)
    stids = (skey & ((1 << 14) - 1)).astype(jnp.int32)
    sstripes = ((1 << 17) - 1) - (skey >> 14)
    if n_sorted != n_tiles:                                  # sentinel pad
        stids = jnp.concatenate(
            [stids, jnp.full((n_sorted - n_tiles,), n_tiles, jnp.int32)])
        sstripes = jnp.concatenate(
            [sstripes, jnp.zeros((n_sorted - n_tiles,), jnp.int32)])
    gchunks = sstripes[::group]       # first of each tuple = the max
    return stids, sstripes, gchunks


def group_histogram(tx0, cx, ty0, cy, ntx: int, nty: int,
                    group: int, sub: int, interpret: bool = False):
    """Per-tile counts, sorted group composition, and per-group chunk demand
    — shared by sizing and placement (these MUST agree — capacity bucketing
    uses one caller, bin placement the other).

    Tile counts come from a separable membership matmul on the MXU (exact in
    f32 for < 2^24). Groups are COMPOSED of count-sorted tiles: sort tiles
    by descending stripe demand ``ceil(count/sub)`` and take consecutive
    ``group``-tuples, so each chunk's stripes carry near-equal loads — the
    measured stripe-rounding padding of the fixed vertical-quadruple
    grouping (group chunks = max over 4 neighbors) drops from ~27% over the
    packing floor to ~1% on the bench scenes. A group's chunk count is then
    simply its FIRST (largest) tile's stripe count.

    Returns (tile_counts (n_tiles,) i32, stids (n_sorted,) i32 tile id per
    sorted position — padded with the sentinel ``n_tiles`` to a multiple of
    ``group`` — sstripes (n_sorted,) i32 stripe demand per sorted position,
    and gchunks (n_groups,) i32).
    """
    # the packed sort key below gives the tile id 14 bits; callers past
    # this budget must degrade to the un-grouped path BEFORE sizing
    # (raster_pallas.grouped_slot_total does) — a silent bleed into the
    # inv field would mis-sort and produce garbage capacity totals
    assert ntx * nty < (1 << 14), \
        "image too large for the packed tile-sort key"
    xs = jnp.arange(ntx, dtype=jnp.int32)[None, :]
    ys = jnp.arange(nty, dtype=jnp.int32)[None, :]
    mx = ((xs >= tx0[:, None]) & (xs < (tx0 + cx)[:, None])).astype(jnp.float32)
    my = ((ys >= ty0[:, None]) & (ys < (ty0 + cy)[:, None])).astype(jnp.float32)
    # DEFAULT precision, not "highest": the 0/1 membership masks are exact
    # in bf16 and the MXU accumulates in f32, so single-pass counts are
    # exact below 2^24 — the 6-pass f32 decomposition is pure overhead here
    counts2d = jnp.matmul(my.T, mx)                          # (nty, ntx)
    tile_counts = counts2d.reshape(-1).astype(jnp.int32)
    n_tiles = ntx * nty
    stids, sstripes, gchunks = _compose_groups(tile_counts, n_tiles, group,
                                               sub, interpret=interpret)
    return tile_counts, stids, sstripes, gchunks


def grouped_limits_ok(t: int, slot_cap: int, ntx: int, nty: int) -> bool:
    """Static-shape budget of the packed grouped binner.

    ``bin_sort_grouped`` packs (triangle, tile) pairs into single int32
    words (17 bits triangle / 14 bits tile / 6 bits span width); callers
    must degrade to the un-grouped path (``bin_pairs[_fast]`` + the
    one-tile kernel, which has no packing budgets) when a workload exceeds
    these — see ``raster_pallas._stage_b``.
    """
    return (t < (1 << 17) and slot_cap < (1 << 17) and ntx <= 63
            and ntx * nty < (1 << 14))


@functools.partial(jax.jit, static_argnames=("ntx", "nty", "slot_cap",
                                             "group", "sub", "interpret"))
def bin_sort_grouped(tx0, cx, ty0, cy, ntx: int, nty: int, slot_cap: int,
                     group: int = 8, sub: int = 16, interpret: bool = False):
    """Counting-sort triangles into group-interleaved, count-sorted tile bins.

    A "group" is ``group`` tiles sharing one raster grid step; each 128-slot
    chunk interleaves the group's tiles as ``sub``-lane stripes. Groups are
    composed of COUNT-SORTED tiles (see ``group_histogram``), so a group's
    stripes carry near-equal loads and its chunk count ≈ its mean tile's
    stripe demand instead of its worst neighbor's.

    Returns (order (slot_cap,) i32 clamped, gstart_rows (n_groups,) i32 in
    SLOTS, gchunks (n_groups,) i32, stids (n_sorted,) i32 tile id per sorted
    position, sstripes (n_sorted,) i32 stripe demand per sorted position
    (the raster kernel's issued-DMA predicate), tile_counts (n_tiles,),
    total_slots, n_active_tiles).
    """
    t = tx0.shape[0]
    assert group * sub == 128
    n_tiles = ntx * nty
    n_sorted = -(-n_tiles // group) * group
    n_groups = n_sorted // group
    assert slot_cap % 128 == 0
    # packed-descriptor bit budget: cx gets 6 bits (ntx <= 63) and the tile
    # index 14 bits (< 16384 tiles, one value reserved for the sentinel)
    assert ntx <= 63 and n_tiles < (1 << 14), \
        "image too large for the packed bin descriptor"

    tile_counts, stids, sstripes, gchunks = group_histogram(
        tx0, cx, ty0, cy, ntx, nty, group, sub, interpret=interpret)
    gchunks, gstarts, _start_c, total_slots = _clamp_group_chunks(
        gchunks, slot_cap // 128)

    # Pair expansion (shared with bin_gather_grouped); the scalar placement
    # kernel is left with one branchless cursor-bump emit per pair.
    assert t < (1 << 17), "pair packing supports up to 2^17 triangles"
    assert slot_cap < (1 << 17), "pair packing supports up to 2^17 slots"
    tri_p, tile_p, n_pairs, _total = _expand_pairs(tx0, cx, ty0, cy, ntx,
                                                   slot_cap)
    pairs = (tri_p << 14) | tile_p               # [0:14] tile, [14:] triangle
    # tail past the true pair count → sentinel pairs targeting the virtual
    # tile n_tiles (bound 0, never stored); lets the kernel's unrolled loop
    # overrun the count by up to unroll-1 slots safely (slot_cap % 128 == 0
    # is asserted above and unroll is 8, so the overrun never leaves the
    # pairs array)
    idx = jnp.arange(slot_cap, dtype=jnp.int32)
    pairs = jnp.where(idx < n_pairs, pairs, jnp.int32(n_tiles))

    kernel = _make_group_kernel(n_tiles, n_sorted, group, sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((n_tiles + 1,), jnp.int32),
            pltpu.SMEM((n_tiles + 1,), jnp.int32),
            pltpu.SMEM((n_tiles + 1,), jnp.int32),
            pltpu.SMEM((n_tiles + 1,), jnp.int32),
        ],
    )
    order = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((slot_cap // 128, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pairs, n_pairs.reshape(1), gstarts, stids)
    order = jnp.clip(order.reshape(-1), 0, t)
    n_active = jnp.sum((tile_counts > 0).astype(jnp.int32))
    return (order, gstarts, gchunks, stids, sstripes, tile_counts,
            total_slots, n_active)


@functools.partial(jax.jit, static_argnames=(
    "ntx", "nty", "slot_cap", "group", "sub", "interpret", "tile_h",
    "tile_w", "tiles_per_view"))
def bin_gather_grouped(rows, tx0, cx, ty0, cy, ntx: int, nty: int,
                       slot_cap: int, group: int = 8, sub: int = 16,
                       interpret: bool = False, tile_h: int = 0,
                       tile_w: int = 0, tiles_per_view: int = 0):
    """Sorted-gather binning: bitonic key sort + vectorized interleave.

    Produces the same group-interleaved binned-row buffer as
    ``bin_sort_grouped`` + ``binning.gather_binned`` but with NO scalar
    placement loop — the measured 0.31 ms cursor-chain emit kernel is
    replaced by a ~30 us Pallas bitonic sort (``sort_pallas``) plus pure
    vector index math:

    1. pack each (triangle, tile) pair as ``(tile << 17) | tri`` — the
       ascending sort groups pairs per tile with ascending triangle order
       inside (the stable order the depth-tie rank rule needs);
    2. bitonic-sort the packed keys; gather the plane rows into sorted
       order (one fast ROW gather — XLA vectorizes row gathers, while a
       same-size 1-D element gather costs a measured 0.69 ms, so every
       per-slot map below is built from row gathers, repeats, and one more
       scatter+cummax fill-forward, never element gathers);
    3. build the group-interleaved gather indices in closed form: slot
       (chunk c, lane l) holds the tile of stripe ``l // sub`` of chunk
       c's group at rank ``(c - group_start) * sub + l % sub``, whose
       sorted position is ``tile_run_start + rank``. Per-chunk group ids
       fill forward over the chunk axis; per-stripe run starts expand from
       a (n_groups, 128) table by one row gather;
    4. one second row gather reorders the sorted rows into the interleaved
       layout the grouped raster kernel consumes.

    Returns (binned (slot_cap + 128, R) f32, gstarts, gchunks, stids,
    sstripes, tile_counts, total_slots, n_active) — the same group tables
    as ``bin_sort_grouped``. Under capacity overflow both paths clamp the
    same way at the TABLE level (trailing groups lose chunks, detectable
    via ``total_slots > slot_cap``) and both stay SAFE (out-of-run reads
    land on real rows — harmless by the duplicate-or-fail-bbox SAFETY
    INVARIANT in ``binning.plane_data``), but the two truncated frames are
    NOT bit-identical to each other: the pair stream itself is cut at
    ``slot_cap`` here vs per-group chunk clamping there, so different
    surviving pairs fill the clamped slots. Equivalence to the
    ``bin_sort_grouped`` oracle holds at ample capacity only (the
    overflow window is exactly the provisional-frame window —
    ``fillers.AdvancedPixelBufferFiller`` repairs it by re-rendering at
    grown capacity, never by trusting a truncated frame).
    """
    from .sort_pallas import bitonic_sort_i32

    t = tx0.shape[0]
    assert group * sub == 128
    chunk = 128
    n_tiles = ntx * nty
    n_sorted = -(-n_tiles // group) * group
    assert slot_cap % chunk == 0
    assert ntx <= 63 and n_tiles < (1 << 14), \
        "image too large for the packed bin descriptor"
    assert t < (1 << 17), "pair packing supports up to 2^17 triangles"
    assert slot_cap < (1 << 17), "pair packing supports up to 2^17 slots"
    n_chunks = slot_cap // chunk

    # ---- pair expansion (shared with bin_sort_grouped) packed as
    # (tile << 17) | tri for the single-operand stable sort; reaches
    # exactly INT32_MAX at the asserted limits — zero headroom, same exact
    # fit as bin_sort_grouped's packing
    tri_p, tile_p, n_pairs, total_pairs = _expand_pairs(tx0, cx, ty0, cy,
                                                        ntx, slot_cap)
    idx = jnp.arange(slot_cap, dtype=jnp.int32)
    valid = idx < n_pairs
    if tile_h and tile_w:
        # CONSERVATIVE PER-PAIR TRIVIAL-REJECT: a triangle's bbox overlaps
        # many tiles its edges never enter (thin/diagonal triangles). For
        # each pair, evaluate each edge function's MAXIMUM over the tile's
        # integer pixel grid — the affine's most-inside corner, chosen per
        # coefficient sign, with the kernel's own association
        # ``A·x + (B·y + C)`` (f32 rounding is monotonic per op, so the
        # corner value bounds every interior evaluation) — and drop pairs
        # where any λmax < 0: provably no pixel passes the λ≥0 coverage
        # rule. EXACTNESS: reject only provable misses; a rejected row
        # re-entering the tile via chunk-tail clamping still fails the
        # per-pixel coverage test in the kernel (the same λ, evaluated at
        # real pixels), so rendered output is bit-identical. NaN/degenerate
        # coefficients compare false against "< 0" → kept (conservative).
        coef = rows[:, :9][jnp.minimum(tri_p, rows.shape[0] - 1)]
        tloc = tile_p % tiles_per_view if tiles_per_view else tile_p
        fx0 = (tloc % ntx).astype(jnp.float32) * tile_w
        fy0 = (tloc // ntx).astype(jnp.float32) * tile_h
        fx1 = fx0 + (tile_w - 1)
        fy1 = fy0 + (tile_h - 1)

        def lmax(a, b, c):
            xe = jnp.where(a > 0, fx1, fx0)
            ye = jnp.where(b > 0, fy1, fy0)
            return xe * a + (ye * b + c)

        bad = ((lmax(coef[:, 0], coef[:, 1], coef[:, 2]) < 0)
               | (lmax(coef[:, 3], coef[:, 4], coef[:, 5]) < 0)
               | (lmax(coef[:, 6], coef[:, 7], coef[:, 8]) < 0))
        valid = valid & ~bad
    keys = (tile_p << 17) | tri_p
    keys = jnp.where(valid, keys, jnp.int32(n_tiles) << 17)

    skeys = bitonic_sort_i32(keys, interpret=interpret)
    sorted_tri = jnp.minimum(skeys & ((1 << 17) - 1), t - 1)

    if tile_h and tile_w:
        # ---- per-tile counts of the SURVIVING pairs, from the sorted keys
        # (the separable histogram matmul cannot account per-pair rejects);
        # ``bounds`` doubles as the tile-run position table below
        bounds = jnp.searchsorted(
            skeys, jnp.arange(n_tiles + 1, dtype=jnp.int32) << 17,
            side="left").astype(jnp.int32)
        tile_counts = bounds[1:] - bounds[:-1]
        stids, sstripes, gchunks = _compose_groups(
            tile_counts, n_tiles, group, sub, interpret=interpret)
        gchunks, gstarts, start_c, total_slots = _clamp_group_chunks(
            gchunks, n_chunks)
        # a clamped EXPANSION under-reports post-reject demand — surface
        # the unclamped rectangle total so the overflow check still fires
        total_slots = jnp.where(total_pairs > n_pairs,
                                jnp.maximum(total_slots, total_pairs),
                                total_slots)
    else:
        # reject off: the separable MXU histogram + cumsum (cheaper than
        # the searchsorted over the sorted keys)
        tile_counts, stids, sstripes, gchunks = group_histogram(
            tx0, cx, ty0, cy, ntx, nty, group, sub, interpret=interpret)
        gchunks, gstarts, start_c, total_slots = _clamp_group_chunks(
            gchunks, n_chunks)
        bounds = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(tile_counts)]).astype(jnp.int32)
    n_groups = int(gchunks.shape[0])

    # ---- closed-form interleave indices, no element gathers
    # per-chunk group id, group chunk count, and group chunk-start, fill-
    # forward over chunks. B and start_c <= slot_cap/128 < 2^10 (slot_cap
    # < 2^17 asserted); the single packed word gives g 11 bits, enough
    # only while n_groups <= 2048 — group < 8 can push n_groups past that
    # (n_tiles < 2^14 / group), where we split into two fill-forward words
    # (each strictly increasing in g, 21b g + 10b payload).
    gi = jnp.arange(n_groups, dtype=jnp.int32)
    gpos = jnp.where(gchunks > 0, start_c, n_chunks)
    zc = jnp.zeros((n_chunks,), jnp.int32)
    if n_groups <= (1 << 11):
        gword = jax.lax.cummax(
            zc.at[gpos].set((gi << 20) | (gchunks << 10) | start_c,
                            mode="drop", unique_indices=True))
        g_of_chunk = gword >> 20                       # (n_chunks,)
        b_c = (gword >> 10) & ((1 << 10) - 1)          # group chunk count B
        s_c = gword & ((1 << 10) - 1)                  # group chunk start
    else:
        w12 = jax.lax.cummax(
            jnp.zeros((n_chunks, 2), jnp.int32).at[gpos].set(
                jnp.stack([(gi << 10) | start_c, (gi << 10) | gchunks],
                          axis=1), mode="drop", unique_indices=True), axis=0)
        w1, w2 = w12[:, 0], w12[:, 1]
        g_of_chunk = w1 >> 10
        s_c = w1 & ((1 << 10) - 1)
        b_c = w2 & ((1 << 10) - 1)
    j_c = jnp.arange(n_chunks, dtype=jnp.int32) - s_c
    # per-(sorted position) tile run start in the sorted array; expand to a
    # (n_groups, 128) lane table, then ONE row gather per chunk
    tbl = bounds[jnp.minimum(stids, n_tiles)]          # (n_sorted,) small
    tbl2 = jnp.tile(tbl.reshape(-1, group)[:n_groups], (1, sub))
    run0 = tbl2[g_of_chunk]                            # (n_chunks, 128)
    lane = jnp.arange(chunk, dtype=jnp.int32)
    # STRIDED (round-robin) lane-class rank layout: stripe s owns the lane
    # class {s, s+group, s+2*group, ...} and slot (chunk j, lane l) holds
    # stripe (l % group)'s rank (l // group) * B + j — within a class,
    # class-lane m carries the contiguous rank block [m*B, (m+1)*B), so
    # lane order == rank order (the raster epilogue breaks z ties by MIN
    # LANE with no rank channel) AND segments are roll-invariant: circular
    # lane rolls by multiples of ``group`` map every class to itself, so
    # the epilogue's segmented reductions are UNMASKED roll-doubling
    # computing all ``group`` stripes at once (see _raster_group).
    f_idx = run0 + (lane // group)[None, :] * b_c[:, None] + j_c[:, None]
    f_idx = jnp.clip(f_idx.reshape(-1), 0, slot_cap - 1)

    # TWO row gathers, not index-compose + one: the (slot_cap,) int32
    # element gather ``sorted_tri[f_idx]`` costs a measured 0.13 ms (XLA
    # 1-D element gathers are the slow kind — same finding as the 0.69 ms
    # note in the interleave docs), while a second 25-column ROW gather is
    # ~0.05: 0.293 → 0.160 ms for the whole tail (A/B 2026-08-20). The
    # chunk-tail guard rides the same gather (index 0 → a real row, safe
    # by duplicate-or-fail-bbox) instead of a full-array pad copy.
    f_idx = jnp.concatenate([f_idx, jnp.zeros((chunk,), jnp.int32)])
    binned = rows[sorted_tri][f_idx]
    n_active = jnp.sum((tile_counts > 0).astype(jnp.int32))
    return (binned, gstarts, gchunks, stids, sstripes, tile_counts,
            total_slots, n_active)


# The scalar placement kernels store through SMEM output windows (scalar
# stores cannot target VMEM), and SMEM is ~1 MB: the (p_cap//128, 128) i32
# order buffer costs p_cap * 4 bytes, so 2^17 slots (512 KB) is the largest
# capacity that reliably fits alongside the cursor scratch. Callers must
# route bigger workloads to the pure-XLA ``binning.bin_pairs`` (slower —
# bitonic sort — but unbounded); ``raster_pallas._stage_b`` does.
SMEM_PLACEMENT_SLOT_LIMIT = 1 << 17


@functools.partial(jax.jit, static_argnames=("ntx", "nty", "p_cap"))
def bin_sort(tx0, cx, ty0, cy, ntx: int, nty: int, p_cap: int):
    """Counting-sort triangles into tile bins.

    Args are (T,) int32 tile spans (inactive triangles have cx or cy == 0).
    Returns (order (p_cap,) int32 with padding slots == T, tile_starts
    (n_tiles,), tile_counts (n_tiles,), total).
    """
    t = tx0.shape[0]
    n_tiles = ntx * nty
    assert p_cap % 128 == 0 and n_tiles % 128 == 0, \
        "p_cap and n_tiles must be multiples of 128"
    assert p_cap <= SMEM_PLACEMENT_SLOT_LIMIT, \
        "order buffer would overflow SMEM — use binning.bin_pairs"

    # Histogram on the MXU: tile (y, x) count = Σ_t my[t, y]·mx[t, x].
    xs = jnp.arange(ntx, dtype=jnp.int32)[None, :]
    ys = jnp.arange(nty, dtype=jnp.int32)[None, :]
    mx = ((xs >= tx0[:, None]) & (xs < (tx0 + cx)[:, None])).astype(jnp.float32)
    my = ((ys >= ty0[:, None]) & (ys < (ty0 + cy)[:, None])).astype(jnp.float32)
    # guard: zero-span triangles contribute nothing (cx or cy == 0 → mask 0)
    # DEFAULT precision, not "highest": the 0/1 membership masks are exact
    # in bf16 and the MXU accumulates in f32, so single-pass counts are
    # exact below 2^24 — the 6-pass f32 decomposition is pure overhead here
    counts2d = jnp.matmul(my.T, mx)                          # (nty, ntx)
    counts = counts2d.reshape(-1).astype(jnp.int32)          # (n_tiles,)
    csum = jnp.cumsum(counts)
    total = csum[-1]
    raw_starts = jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])

    kernel = _make_kernel(t, n_tiles, ntx, p_cap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((n_tiles,), jnp.int32),
        ],
    )
    order = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p_cap // 128, 128), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tx0, cx, ty0, cy, raw_starts, total.reshape(1))
    # clamp: unplaced capacity slots hold stale ints; any in-range row is
    # harmless (see kernel note), index t is the zero pad row
    order = jnp.clip(order.reshape(-1), 0, t)
    # Clamp the bin layout to the static capacity so raster-side DMA reads
    # can never run past the binned buffer on overflow (overflow remains
    # detectable via total > p_cap; trailing bins lose entries).
    starts = jnp.minimum(raw_starts, p_cap)
    counts = jnp.minimum(counts, p_cap - starts)
    n_active = jnp.sum((counts > 0).astype(jnp.int32))
    return order, starts, counts, total, n_active
