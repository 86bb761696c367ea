"""Cost of the XLA dequad relayout ([B, W, D, W] -> [B*D, W*W]) that
feeds stats_select_fused — the fused-stats stage's only remaining
consumer of the flat raster (pipeline/decode.py stage B). Hoist-proof:
the operand is jnp.roll'ed by the loop index."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

B, W, D = 256, 64, 4
rng = np.random.default_rng(3)
okq = jnp.asarray(rng.integers(0, 1 << 15, (B, W, D * W), np.int32))

REPS = 96


@jax.jit
def run(x):
    def step(i):
        xq = jnp.roll(x, i, axis=0)
        flat = (xq.reshape(B, W, D, W).transpose(0, 2, 1, 3)
                .reshape(B * D, W * W))
        # consume with a cheap reduce so the transpose can't fold away
        return jnp.sum(flat[:, ::17], dtype=jnp.int32)
    return lax.map(step, jnp.arange(REPS, dtype=jnp.int32)).sum()


@jax.jit
def run_base(x):
    def step(i):
        xq = jnp.roll(x, i, axis=0)
        return jnp.sum(xq.reshape(B * D, W * W)[:, ::17],
                       dtype=jnp.int32)
    return lax.map(step, jnp.arange(REPS, dtype=jnp.int32)).sum()


for name, fn in (("dequad+reduce", run), ("reduce only", run_base)):
    r = int(fn(okq))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = int(fn(okq))
        ts.append(time.time() - t0)
    print(f"{name:14s}: {min(ts)/REPS*1e3:6.3f} ms/batch256  [{r}]")
