"""Raw HBM streaming bandwidth probe: y = x + i over big arrays,
hoist-proof (input XORed with loop index), amortized in one dispatch."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

REPS = 20
for mb in (16, 64, 256):
    n = mb * (1 << 20) // 4
    x = jax.device_put(np.arange(n, dtype=np.int32).reshape(-1, 512))

    @jax.jit
    def bw(x):
        return lax.map(
            lambda i: (x ^ i).sum(),
            jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = int(bw(x))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = int(bw(x))
        ts.append(time.time() - t0)
    dt = min(ts) / REPS
    gbs = mb / 1024 / dt
    print(f"{mb:4d} MB read: {dt*1e3:6.2f} ms -> {gbs:7.1f} GB/s [{r}]")
