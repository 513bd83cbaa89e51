"""Primitive-cost probe for the raster epilogue redesign (PERF_NOTES roadmap 1).

This probe drove the round-4 GROUP-PACKED epilogue redesign: it showed
the old per-stripe epilogue's cost was accumulator RE-STREAMING
(epi_cur8 9.4 vs epi_rr_group 3.6 us/group), which the strided-class
unmasked roll-doubling now avoids (landed: raster_pallas._raster_group;
in-situ slopes via raster_slope.py). Kept for future epilogue A/Bs.
Each primitive's marginal cost is measured inside a realistic Pallas
kernel (same shapes, same compiler) by replicating it R times against
live VMEM scratch and fitting ms vs R:

  reduce    — jnp.min over the 128-lane axis of (16, 32, 128) (the OLD
              per-stripe masked tree)
  wherered  — where(seg-mask) + the same reduce (the actual per-stripe op)
  extract   — static single-lane extract x[:, :, k] -> (16, 32)
  roll      — pltpu.roll by 16 lanes (butterfly-round building block)
  segsum    — (512, 128) @ (128, 128) f32 MXU matmul with HIGHEST precision
              (the one-hot segmented-sum attr resolve candidate)
  segsum6   — the same contraction at the stacked (6*512, 128) shape
  stack6red — masked min-reduce over the stacked (6, 16, 32, 128) (today's
              fused attr reduction, x1 per stripe)
  epi_cur   — the production per-stripe tile_block minus the obuf store,
              with a broadcast-collapsed attr stack (lower bound)
  epi_cur6  — epi_cur with six DISTINCT attr channels: the honest
              production per-stripe cost
  epi_bfly_once   — butterfly prologue shared by all 8 stripes (segmented
              z-min + tie-break lane via 4 masked roll-doubling rounds)
  epi_bfly_stripe — per-stripe remainder once win/ztb are precomputed
  slicered  — static 16-lane slice of one segment + min over the narrow
              tensor (is an 8x-narrower epilogue possible?)
  epi_slice — the full per-stripe epilogue on the sliced (TH, TW, 16) view
  epi_cur8  — the honest CURRENT per-GROUP epilogue: 8 stripes, each
              re-reading all 6 attr channels from VMEM (measures the
              re-stream overhead epi_cur6 hides)
  epi_rr_group — the GROUP-PACKED candidate: round-robin strided segments
              (stripe = lane %% 8), unmasked roll-doubling computing all 8
              stripes at once, one (TH, TW, K) output block assembled by
              lane-class selects (lane = stripe + 8*plane), ONE store

Each rep perturbs its input by rep * 1e-30 (runtime identity in f32) so the
compiler cannot hoist or CSE the replicas; results accumulate into an output
scalar so nothing is DCE'd. Usage: python tools/probes/epi_prims.py [prim...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, K = 16, 32, 128
SUB = 16
NITER = 10
REPS = (0, 128, 256)

lane_np = np.arange(K, dtype=np.int32)
SEG_NP = (lane_np // SUB)
SMAT = (SEG_NP[:, None] == SEG_NP[None, :]).astype(np.float32)


def _prim_body(name, x, attr, smat, attr6=None):
    """One replica of the primitive; returns a scalar folded into the carry."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    seg = lane // SUB
    if name == "reduce":
        r = jnp.min(x, axis=2)                          # (TH, TW)
        return r[0, 0]
    if name == "wherered":
        r = jnp.min(jnp.where(seg == 3, x, jnp.inf), axis=2)
        return r[0, 0]
    if name == "extract":
        r = x[:, :, 48]                                  # (TH, TW)
        return r[0, 0]
    if name == "roll":
        r = pltpu.roll(x, 16, 2)
        return r[0, 0, 0]
    if name == "segsum":
        v = x.reshape(TH * TW, K)
        y = jax.lax.dot_general(v, smat, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        return y[0, 0]
    if name == "segsum6":
        v = jnp.broadcast_to(x[None], (6, TH, TW, K)).reshape(6 * TH * TW, K)
        y = jax.lax.dot_general(v, smat, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        return y[0, 0]
    if name == "stack6red":
        st = jnp.broadcast_to(attr[None] + x[0, 0, 0], (6, TH, TW, K))
        r = jnp.max(jnp.where((seg == 3)[None], st, -jnp.inf), axis=3)
        return r[0, 0, 0]
    if name == "epi_cur":
        # the production tile_block for ONE stripe (raster_pallas), minus
        # the obuf store: 2 masked reduces + 2 broadcast-back compares +
        # the fused stacked attr reduce + concat. Full output folded via a
        # sum so nothing is DCE'd.
        lanef = lane.astype(jnp.float32)
        afin = jnp.broadcast_to(attr[None] + x[0, 0, 0], (6, TH, TW, K))
        inseg = seg == 3
        zt = jnp.min(jnp.where(inseg, x, jnp.inf), axis=2)
        zt_out = jnp.where(jnp.isinf(zt), jnp.float32(0.0), zt)
        cand = inseg & (x == zt[..., None])
        lmin = jnp.min(jnp.where(cand, lanef, jnp.inf), axis=2)
        win = cand & (lanef == lmin[..., None])
        has = ~jnp.isinf(zt)
        av = jnp.max(jnp.where(win[None], afin, -jnp.inf), axis=3)
        av = jnp.where(has[None], av, 0.0)
        out = jnp.concatenate([av[0], av[1], av[2], zt_out, av[3], av[4],
                               av[5], jnp.zeros_like(zt_out)], axis=1)
        return jnp.sum(out)
    if name == "epi_bfly_once":
        # butterfly prologue shared by ALL 8 stripes of a group: segmented
        # min of z and of the tie-break lane, full-width — no broadcasts.
        # Masked Hillis-Steele doubling in both directions within 16-lane
        # segments: 4 rounds x (2 rolls + 2 selects + 2 mins).
        lanef = lane.astype(jnp.float32)
        lmod = lane % SUB

        def segmin(v):
            for sh in (1, 2, 4, 8):
                fwd = pltpu.roll(v, sh, 2)       # lane k <- k-sh
                bwd = pltpu.roll(v, K - sh, 2)   # lane k <- k+sh
                v = jnp.minimum(v, jnp.where(lmod >= sh, fwd, jnp.inf))
                v = jnp.minimum(v, jnp.where(lmod < SUB - sh, bwd, jnp.inf))
            return v

        ztb = segmin(x)
        cand = x == ztb
        lmb = segmin(jnp.where(cand, lanef, jnp.inf))
        win = cand & (lanef == lmb)
        return jnp.sum(jnp.where(win, x, 0.0)) + jnp.sum(ztb)
    if name == "epi_bfly_stripe":
        # per-stripe remainder once win/ztb are precomputed full-width:
        # one masked z reduce + the fused stacked attr reduce + concat
        win = x > 0.5  # stand-in mask, same shape/layout
        afin = jnp.broadcast_to(attr[None] + x[0, 0, 0], (6, TH, TW, K))
        inseg = seg == 3
        zt = jnp.min(jnp.where(inseg, x, jnp.inf), axis=2)
        zt_out = jnp.where(jnp.isinf(zt), jnp.float32(0.0), zt)
        has = ~jnp.isinf(zt)
        av = jnp.max(jnp.where((win & inseg)[None], afin, -jnp.inf), axis=3)
        av = jnp.where(has[None], av, 0.0)
        out = jnp.concatenate([av[0], av[1], av[2], zt_out, av[3], av[4],
                               av[5], jnp.zeros_like(zt_out)], axis=1)
        return jnp.sum(out)
    if name == "slicered":
        # static 16-lane slice of segment 3 + min over the narrow tensor —
        # if the slice is cheap, the whole epilogue can run 8x narrower
        r = jnp.min(x[:, :, 3 * SUB:4 * SUB], axis=2)
        return jnp.sum(r)
    if name == "epi_slice":
        # full per-stripe epilogue on the sliced (TH, TW, 16) view
        lanef = lane.astype(jnp.float32)[:, :, 3 * SUB:4 * SUB]
        xs = x[:, :, 3 * SUB:4 * SUB]
        a6 = [attr[:, :, ((3 + c) % 8) * SUB:(((3 + c) % 8) + 1) * SUB] + xs
              for c in range(6)]      # six DISTINCT narrow attr slices
        zt = jnp.min(xs, axis=2)
        zt_out = jnp.where(jnp.isinf(zt), jnp.float32(0.0), zt)
        cand = xs == zt[..., None]
        lmin = jnp.min(jnp.where(cand, lanef, jnp.inf), axis=2)
        win = cand & (lanef == lmin[..., None])
        has = ~jnp.isinf(zt)
        avs = [jnp.where(has,
                         jnp.max(jnp.where(win, a, -jnp.inf), axis=2), 0.0)
               for a in a6]
        out = jnp.concatenate(avs[:3] + [zt_out] + avs[3:]
                              + [jnp.zeros_like(zt_out)], axis=1)
        return jnp.sum(out)
    if name == "epi_cur8":
        # the honest CURRENT per-GROUP epilogue: 8 per-stripe collapses,
        # each reading the 6 DISTINCT attr channels from the VMEM scratch
        # (re-streaming ~1.5 MB per stripe — the suspected overhead the
        # per-stripe epi_cur6 number hides)
        lanef = lane.astype(jnp.float32)
        out_total = jnp.float32(0)
        for s in range(8):
            inseg = seg == s
            zt = jnp.min(jnp.where(inseg, x, jnp.inf), axis=2)
            zt_out = jnp.where(jnp.isinf(zt), jnp.float32(0.0), zt)
            cand = inseg & (x == zt[..., None])
            lmin = jnp.min(jnp.where(cand, lanef, jnp.inf), axis=2)
            win = cand & (lanef == lmin[..., None])
            has = ~jnp.isinf(zt)
            a6 = attr6[:] + x[0, 0, 0]          # (6, TH, TW, K) VMEM read
            av = jnp.max(jnp.where(win[None], a6, -jnp.inf), axis=3)
            av = jnp.where(has[None], av, 0.0)
            out = jnp.concatenate([av[0], av[1], av[2], zt_out, av[3],
                                   av[4], av[5], jnp.zeros_like(zt_out)],
                                  axis=1)
            out_total = out_total + jnp.sum(out)
        return out_total
    if name == "epi_rr_group":
        # GROUP-PACKED candidate: stripes own STRIDED lane classes
        # (stripe = lane % 8); unmasked Hillis-Steele doubling with
        # circular rolls by 8/16/32/64 reduces every class at once (roll
        # by multiples of 8 maps each class to itself), the one-hot win
        # mask turns the attr reduction into a sum, and the whole group's
        # output packs into ONE (TH, TW, K) block: lane = stripe + 8*plane
        # (each doubled tensor already holds stripe (lane % 8)'s value at
        # every lane, so assembly is 8 lane-class selects, no extracts).
        lanef = lane.astype(jnp.float32)

        def segred(v, op):
            for sh in (8, 16, 32, 64):
                v = op(v, pltpu.roll(v, sh, 2))
            return v

        ztb = segred(x, jnp.minimum)
        cand = x == ztb
        lmb = segred(jnp.where(cand, lanef, jnp.inf), jnp.minimum)
        win = cand & (lanef == lmb)
        has = ~jnp.isinf(ztb)
        a6 = attr6[:] + x[0, 0, 0]              # ONE (6, TH, TW, K) read
        planes = []
        for c in range(6):
            aw = jnp.where(win, a6[c], 0.0)
            planes.append(jnp.where(has, segred(aw, jnp.add), 0.0))
        zt_out = jnp.where(has, ztb, jnp.float32(0.0))
        order = [planes[0], planes[1], planes[2], zt_out, planes[3],
                 planes[4], planes[5], jnp.zeros_like(zt_out)]
        pcls = lane // 8                        # (1, 1, K) plane class
        gout = jnp.zeros_like(x)
        for p in range(8):
            gout = jnp.where(pcls == p, order[p], gout)
        return jnp.sum(gout)
    if name == "epi_cur6":
        # epi_cur with six DISTINCT attr channels (no broadcast collapse):
        # the honest production per-stripe cost
        lanef = lane.astype(jnp.float32)
        a6 = jnp.stack([attr + jnp.float32(c) for c in range(6)])
        inseg = seg == 3
        zt = jnp.min(jnp.where(inseg, x, jnp.inf), axis=2)
        zt_out = jnp.where(jnp.isinf(zt), jnp.float32(0.0), zt)
        cand = inseg & (x == zt[..., None])
        lmin = jnp.min(jnp.where(cand, lanef, jnp.inf), axis=2)
        win = cand & (lanef == lmin[..., None])
        has = ~jnp.isinf(zt)
        av = jnp.max(jnp.where(win[None], a6, -jnp.inf), axis=3)
        av = jnp.where(has[None], av, 0.0)
        out = jnp.concatenate([av[0], av[1], av[2], zt_out, av[3], av[4],
                               av[5], jnp.zeros_like(zt_out)], axis=1)
        return jnp.sum(out)
    raise ValueError(name)


def make_kernel(name, reps):
    group_prim = name in ("epi_cur8", "epi_rr_group")

    def kernel(x_ref, smat_ref, out_ref, attr, attr6):
        attr[:] = x_ref[:]
        if group_prim:
            for c in range(6):
                attr6[c] = x_ref[:] + jnp.float32(c)
        smat = smat_ref[:] if name.startswith("segsum") else None

        def body(rep, acc):
            x = x_ref[:] + rep.astype(jnp.float32) * jnp.float32(1e-30)
            return acc + _prim_body(name, x, attr[:], smat, attr6)

        acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        out_ref[:] = jnp.full((1, 1), acc, jnp.float32)

    return kernel


def prim_ms(name, reps):
    kernel = make_kernel(name, reps)
    x = jnp.asarray(np.random.default_rng(0).random((TH, TW, K)), jnp.float32)
    smat = jnp.asarray(SMAT)

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TH, TW, K), jnp.float32),
                            pltpu.VMEM((6, TH, TW, K), jnp.float32)],
        )(x, smat)

    @jax.jit
    def chain(x0):
        c = jnp.float32(0)
        for i in range(NITER):
            c = c + run(x + c * jnp.float32(1e-30))[0, 0]
        return c

    jax.block_until_ready(chain(jnp.float32(0)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(jnp.float32(0)))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best / NITER


PRIMS = ["reduce", "wherered", "extract", "roll", "segsum", "segsum6",
         "stack6red", "epi_cur", "epi_bfly_once", "epi_bfly_stripe",
         "slicered", "epi_slice", "epi_cur6"]
want = [a for a in sys.argv[1:] if not a.isdigit()] or PRIMS
for name in want:
    walls = [prim_ms(name, r) for r in REPS]
    x = np.asarray(REPS, np.float64)
    slope, _ = np.polyfit(x, np.asarray(walls), 1)
    per_us = slope * 1e3
    print(f"{name:10s}: {per_us:8.3f} us/op   walls "
          + " ".join(f"{w:6.3f}" for w in walls))
