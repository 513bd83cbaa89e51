import time, numpy as np, jax, jax.numpy as jnp
x = jnp.float32(3.0)
f = jax.jit(lambda v: v * 2)
y = f(x); jax.block_until_ready(y)
t0=time.time()
for _ in range(10):
    v = int(f(x))
print("sync int() per call ms:", (time.time()-t0)/10*1e3, flush=True)
y = f(x); jax.block_until_ready(y)
t0=time.time()
for _ in range(10):
    z = np.asarray(y)
print("np.asarray of ready scalar ms:", (time.time()-t0)/10*1e3, flush=True)
big = jnp.zeros((1024,1024,3)); jax.block_until_ready(big)
t0=time.time()
for _ in range(5):
    z = np.asarray(big)
print("12MB D2H ms:", (time.time()-t0)/5*1e3, flush=True)
