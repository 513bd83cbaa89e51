"""Calibrate effective VPU vreg-op throughput for the roofline arithmetic.

Runs a synthetic Pallas kernel shaped exactly like one raster chunk
iteration's working set — (TH, TW, K) = (16, 32, 128) f32 — doing N chained
elementwise ops (alternating mul/add/select to defeat folding), over the
same 1-D grid size as the T-Rex frame. Slope of time vs N gives
seconds/vreg-op at speed-of-light (no DMA, no scalar work).
"""
import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, K = 16, 32, 128
VREGS = TH * TW * K // (8 * 128)          # vregs per (TH,TW,K) tensor op


def make(n_ops: int, grid: int):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = x
        # alternate op kinds; data-dependent chain so nothing folds
        for i in range(n_ops // 2):
            acc = acc * x + jnp.float32(i)          # fma (or mul+add)
            acc = jnp.where(acc > x, acc - x, acc)  # compare + select
        o_ref[:] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TH, TW, K), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((TH, TW, K), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((TH, TW, K), lambda i: (0, 0, 0)),
        )(x)

    return run


def bench(fn, x, iters=50):
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    grid = 64   # ~ groups/frame scale; fixed-cost amortization
    x = jnp.linspace(0.5, 1.5, TH * TW * K, dtype=jnp.float32).reshape(TH, TW, K)
    results = []
    for n_ops in (8, 32, 128, 512):
        t = bench(make(n_ops, grid), x)
        results.append((n_ops, t))
        print(f"n_ops={n_ops:4d}  {t*1e6:9.1f} us")
    # slope between the two largest
    (n1, t1), (n2, t2) = results[-2], results[-1]
    per_op = (t2 - t1) / ((n2 - n1) * grid)
    # each counted "op" above is 2 tensor ops of VREGS vregs (fma≈1-2, cmp+sel=2)
    print(f"per tensor-op per grid step: {per_op*1e9:.2f} ns")
    print(f"vreg-op/s (at {VREGS} vregs/op): {VREGS / per_op / 1e9:.2f} G")


if __name__ == "__main__":
    main()
