"""Pallas bitonic sort for packed int32 keys.

XLA's ``lax.sort`` lowers to a variadic while-loop network that costs ~4 ms
on frame-sized key arrays (measured; see PERF_NOTES "Tried and rejected").
The TPU-shaped alternative: a fully vectorized bitonic network over the
VMEM-resident key array. Element index i lives at (sublane-row i // 128,
lane i % 128) of an (N/128, 128) block; the XOR-partner exchange of each
pass is two circular rolls plus an iota-mask select — lane-axis rolls for
pass distances < 128, sublane-axis rolls for larger distances. All
O(log² N) passes unroll at trace time into pure VPU compare/selects: ~10
vector ops per pass over N/1024 vregs (~30 us for N = 32k vs 0.31 ms for
the scalar counting-sort placement loop it replaces, and ~3 orders of
magnitude under ``lax.sort``).

Keys must be non-negative int32 (the binners pack (tile << 17) | triangle
— ascending sort groups pairs per tile with ascending triangle order
inside, exactly the stable order the depth-tie rule needs; see
``binsort_pallas``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _make_kernel(n: int):
    rows = n // _LANES

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)

        def partner(x, j):
            # value at element index i ^ j
            if j < _LANES:
                up = pltpu.roll(x, _LANES - j, 1)   # value from lane l + j
                dn = pltpu.roll(x, j, 1)            # value from lane l - j
                return jnp.where((lane & j) == 0, up, dn)
            jr = j // _LANES
            up = pltpu.roll(x, rows - jr, 0)
            dn = pltpu.roll(x, jr, 0)
            return jnp.where((row & jr) == 0, up, dn)

        def bit(j):
            # (i & j) == 0 as a mask, for power-of-two j
            if j < _LANES:
                return (lane & j) == 0
            return (row & (j // _LANES)) == 0

        k = 2
        while k <= n:
            j = k // 2
            while j >= 1:
                p = partner(x, j)
                # i is the lower partner iff (i & j) == 0; the block sorts
                # ascending iff (i & k) == 0 (k == n: single ascending run)
                low = bit(j)
                asc = bit(k) if k < n else jnp.bool_(True)
                keep_min = low == asc
                x = jnp.where(keep_min, jnp.minimum(x, p), jnp.maximum(x, p))
                j //= 2
            k *= 2
        o_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_i32(keys: jnp.ndarray, interpret: bool = False):
    """Ascending sort of a 1-D non-negative int32 key array.

    The length is padded to the next power of two with INT32_MAX (padding
    sorts to the tail); the returned array has the original length. Under
    ``interpret=True`` — or when the default backend is not a TPU (CPU
    test runs trace this without an interpret flag) — this delegates to
    ``lax.sort``: bit-identical result (keys are unique in every caller),
    without the (prohibitively slow) interpreted pass unrolling.
    """
    n0 = keys.shape[0]
    if interpret or jax.default_backend() != "tpu":
        return jax.lax.sort(keys, is_stable=False)
    n = max(256, 1 << (n0 - 1).bit_length())
    if n != n0:
        keys = jnp.pad(keys, (0, n - n0),
                       constant_values=jnp.iinfo(jnp.int32).max)
    out = pl.pallas_call(
        _make_kernel(n),
        out_shape=jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.int32),
    )(keys.reshape(n // _LANES, _LANES))
    return out.reshape(-1)[:n0]
