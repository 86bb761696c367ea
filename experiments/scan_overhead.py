"""Characterize the per-iteration fixed cost of lax.map on this
backend: tiny body, REPS scaling, and map vs python-unrolled chain."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

x_small = jax.device_put(np.arange(256, dtype=np.int32))
x_big = jax.device_put(
    np.arange((64 << 20) // 4, dtype=np.int32).reshape(-1, 512))


def wall(fn, *a):
    r = float(fn(*a))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = float(fn(*a))
        ts.append(time.time() - t0)
    return min(ts), r


for reps in (4, 16, 64):
    @jax.jit
    def m(x):
        return lax.map(lambda i: (x ^ i).sum(),
                       jnp.arange(reps, dtype=jnp.int32)).sum()

    dt, r = wall(m, x_small)
    print(f"map tiny  REPS={reps:3d}: {dt*1e3:8.2f} ms total "
          f"({dt/reps*1e3:6.3f} ms/iter) [{r}]")

for reps in (4, 16):
    @jax.jit
    def m2(x):
        return lax.map(lambda i: (x ^ i).sum(),
                       jnp.arange(reps, dtype=jnp.int32)).sum()

    dt, r = wall(m2, x_big)
    print(f"map 64MB  REPS={reps:3d}: {dt*1e3:8.2f} ms total "
          f"({dt/reps*1e3:6.3f} ms/iter) [{r}]")

for reps in (4, 16):
    @jax.jit
    def unroll(x):
        tot = jnp.int32(0)
        for i in range(reps):
            tot = tot + (x ^ i).sum()
        return tot

    dt, r = wall(unroll, x_big)
    print(f"unroll 64MB REPS={reps:3d}: {dt*1e3:8.2f} ms total "
          f"({dt/reps*1e3:6.3f} ms/iter) [{r}]")

# fori_loop for comparison
for reps in (16,):
    @jax.jit
    def floop(x):
        def body(i, tot):
            return tot + (x ^ i).sum()
        return lax.fori_loop(0, reps, body, jnp.int32(0))

    dt, r = wall(floop, x_big)
    print(f"fori 64MB  REPS={reps:3d}: {dt*1e3:8.2f} ms total "
          f"({dt/reps*1e3:6.3f} ms/iter) [{r}]")
