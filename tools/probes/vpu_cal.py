"""Calibrate effective VPU vreg-op throughput for the roofline arithmetic.

Runs a synthetic Pallas kernel shaped exactly like one raster chunk
iteration's working set — (TH, TW, K) = (16, 32, 128) f32 — doing N chained
elementwise ops (alternating fma / compare+select to match the raster mix),
over a grid sized like the T-Rex frame's group count. Slope of time vs N
gives seconds per tensor-op; at 64 vregs per (TH, TW, K) op that calibrates
effective vreg-ops/s for PERF_NOTES' floor arithmetic.

Methodology notes (the first version measured NEGATIVE slopes):
* every grid step reads a DIFFERENT input block and the result is carried
  across steps via VMEM scratch accumulation — a constant (0,0,0) index map
  plus identical per-step work lets the compiler collapse the grid;
* timing wraps NITER dependent invocations inside ONE jit (the tunnel's
  per-dispatch floor and async-dispatch queueing both poison host-side
  per-call timing).
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, K = 16, 32, 128
VREGS = TH * TW * K // (8 * 128)          # vregs per (TH,TW,K) tensor op
GRID = 64                                  # ~ groups/frame scale
NITER = 10


def make(n_ops: int):
    def kernel(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros((TH, TW, K), jnp.float32)

        x = x_ref[0]
        acc = x + acc_ref[:] * jnp.float32(1e-30)   # carry dependence
        for j in range(n_ops // 2):
            acc = acc * x + jnp.float32(j)              # fma
            acc = jnp.where(acc > x, acc - x, acc)      # compare + select
        acc_ref[:] = acc

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc

    def run_once(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TH, TW, K), jnp.float32),
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, TH, TW, K), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((TH, TW, K), lambda i: (0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((TH, TW, K), jnp.float32)],
        )(x)

    @jax.jit
    def run(x):
        def body(_, carry):
            out = run_once(x + carry * jnp.float32(1e-30))
            return out[0, 0, 0]
        return jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))

    return run


def bench(fn, x):
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        best = min(best, (time.perf_counter() - t0) / NITER)
    return best


def main():
    x = jnp.linspace(0.5, 1.5, GRID * TH * TW * K,
                     dtype=jnp.float32).reshape(GRID, TH, TW, K)
    results = []
    for n_ops in (8, 32, 128, 512):
        t = bench(make(n_ops), x)
        results.append((n_ops, t))
        print(f"n_ops={n_ops:4d}  {t*1e6:9.1f} us", flush=True)
    # slope between the two largest (fixed costs cancel)
    (n1, t1), (n2, t2) = results[-2], results[-1]
    per_op = (t2 - t1) / ((n2 - n1) * GRID)
    print(f"per tensor-op per grid step: {per_op*1e9:.2f} ns")
    print(f"vreg-op/s (at {VREGS} vregs/op): {VREGS / per_op / 1e9:.2f} G")
    print(f"=> one raster chunk iteration (~2160 FMA-counted vreg-ops) "
          f"floor: {2160 * per_op / VREGS * 1e6:.2f} us")


if __name__ == "__main__":
    main()
