"""Is a one-hot segmented-sum MXU matmul BIT-exact vs the masked reduce?

The epilogue-redesign candidate (PERF_NOTES roadmap 1) resolves the six
winner attributes with one f32 matmul against a 0/1 segment matrix instead
of per-stripe masked reductions. That is only admissible if
``(win ? v : 0) @ SMAT`` reproduces the winner value BIT-exactly: each
output element is v*1 + 0*1 + ... — with ``precision=HIGHEST`` the bf16x3
split of v recombines exactly (v_hi + v_mid + v_lo == v by construction)
— but hardware must confirm. Known, accepted exception: a winner of -0.0
sums to +0.0 (float-equal, bit-different).

Checks 2^20 random f32 values spanning the full exponent range (plus
denormals, huge values, and exact -0.0) one-hot-scattered into 16-lane
segments; prints the count of bit-mismatches excluding the -0.0 case.
Usage: python tools/probes/segsum_exact.py
"""
import numpy as np
import jax
import jax.numpy as jnp

K, SUB = 128, 16
N = 1 << 13  # rows per batch; x 8 segments x 16 batches = 2^20 values

lane = np.arange(K)
SEG = lane // SUB
SMAT = jnp.asarray((SEG[:, None] == SEG[None, :]).astype(np.float32))


@jax.jit
def segsum(v):
    return jax.lax.dot_general(v, SMAT, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


rng = np.random.default_rng(0)
bad = neg0 = 0
for batch in range(16):
    # full-exponent-range f32: random bits, NaN/inf filtered out
    bits = rng.integers(0, 1 << 32, size=(N, 8), dtype=np.uint32)
    vals = bits.view(np.float32)
    vals = np.where(np.isfinite(vals), vals, np.float32(1.5))
    if batch == 0:
        vals[0, :] = -0.0
        vals[1, :] = np.float32(1e-40)   # denormal
        vals[2, :] = np.float32(3e38)
    winner = rng.integers(0, SUB, size=(N, 8))
    v = np.zeros((N, K), np.float32)
    cols = winner + np.arange(8) * SUB
    v[np.arange(N)[:, None], cols] = vals
    out = np.asarray(segsum(jnp.asarray(v)))
    got = out[np.arange(N)[:, None], np.arange(8) * SUB]
    mism = got.view(np.uint32) != vals.view(np.uint32)
    is_neg0 = (vals.view(np.uint32) == 0x80000000) & (got == 0.0)
    neg0 += int((mism & is_neg0).sum())
    bad += int((mism & ~is_neg0).sum())
print(f"bit-mismatches (excl -0.0): {bad} / {16 * N * 8}   "
      f"-0.0 -> +0.0 flips: {neg0}")
