"""hist-vs-sort component-stats: bit-equality on random + corpus-like
data, then amortized TPU timing at decode shapes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from meterelf_tpu.ops import components as comp_ops

W = 64
rng = np.random.default_rng(0)

# ---- correctness: random blobby masks through the full analyze ----
K = 64
yy, xx = np.mgrid[:W, :W]
disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2
closed = np.zeros((K, W, W), bool)
for k in range(K):
    for _ in range(rng.integers(0, 4)):
        cy, cx = rng.integers(12, 52, 2)
        a, b = rng.integers(2, 14, 2)
        closed[k] |= ((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2 <= 1.0
    closed[k] |= rng.random((W, W)) < rng.choice([0.0, 0.02, 0.3])
masked = closed & disk
diskb = np.broadcast_to(disk, (K, W, W)).copy()

run = jax.jit(comp_ops.analyze_batch, static_argnames=("impl", "stats"))
r_s = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
          impl="xla", stats="sort")
r_h = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
          impl="xla", stats="hist")
print("needle_region equal:",
      bool(jnp.array_equal(r_s.needle_region, r_h.needle_region)),
      " has_any equal:", bool(jnp.array_equal(r_s.has_any, r_h.has_any)))

# ---- timing at decode shape: K = B*D with bbox ----
B, D = 256, 4
KT = B * D
ok_np = rng.integers(0, 4 * (W * W + 1), (KT, W, W), np.int32)
okey = jax.device_put(ok_np)
mk = jax.device_put(rng.random((KT, W, W)) < 0.1)
cl = jax.device_put(rng.random((KT, W, W)) < 0.12)
conv = jax.device_put(np.ones(KT, bool))
origins = tuple((8, 8) for _ in range(D))
bbox = (origins, 48)

REPS = 16
for stats in ("sort", "hist"):
    @jax.jit
    def rep(okey, mk, cl, conv, stats=stats):
        def one(i):
            r = comp_ops._finalize(okey ^ i, mk, cl, conv,
                                   static_bbox=bbox, stats=stats)
            return r.needle_region.sum().astype(jnp.int32)
        return lax.map(one, jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(okey, mk, cl, conv))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(okey, mk, cl, conv))
        ts.append(time.perf_counter() - t0)
    print(f"{stats:5s} {min(ts) / REPS * 1e3:7.2f} ms/batch(B={B})  [{r}]")
