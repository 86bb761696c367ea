"""hist_pallas-vs-sort stats: needle_region equality on random blobby
masks (XLA propagation feeds both), then amortized TPU timing of the
two _finalize variants at the decode shape (K=1024)."""
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
rng = np.random.default_rng(1)

K = 256
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

run = jax.jit(comp_ops.analyze_batch,
              static_argnames=("impl", "stats", "static_bbox"))
r_s = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
          impl="xla", stats="sort")
r_p = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
          impl="xla", stats="hist_pallas")
eq_nr = bool(jnp.array_equal(r_s.needle_region, r_p.needle_region))
eq_ha = bool(jnp.array_equal(r_s.has_any, r_p.has_any))
print("needle_region equal:", eq_nr, " has_any equal:", eq_ha)
assert eq_nr and eq_ha

# with the per-dial bbox (the production sort configuration)
D = 4
origins = tuple((8, 8) for _ in range(D))
r_sb = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
           impl="xla", stats="sort", static_bbox=(origins, 48))
eq_nr2 = bool(jnp.array_equal(r_sb.needle_region, r_p.needle_region))
print("vs bbox-sort equal:", eq_nr2)
assert eq_nr2

# ---- amortized timing of the stats stage alone at K=1024 ----
KT = 1024
okey, conv = jax.jit(comp_ops._propagate_xla)(
    jnp.asarray(np.tile(masked, (4, 1, 1))),
    jnp.asarray(np.tile(diskb, (4, 1, 1))))
okey = jax.device_put(np.asarray(okey))
mk = jax.device_put(np.tile(masked, (4, 1, 1)))
cl = jax.device_put(np.tile(closed, (4, 1, 1)))
cv = jax.device_put(np.ones(KT, bool))
bbox = (tuple((8, 8) for _ in range(D)), 48)

for name, kw in [("sort+bbox", dict(static_bbox=bbox, stats="sort")),
                 ("hist_pallas", dict(stats="hist_pallas"))]:
    fn = jax.jit(lambda o, m, c, v, kw=kw: lax.map(
        lambda _: comp_ops._finalize(o, m, c, v, **kw).needle_region.sum(),
        jnp.arange(20)).sum())
    r = int(fn(okey, mk, cl, cv))
    t0 = time.time()
    r = int(fn(okey, mk, cl, cv))
    dt = (time.time() - t0) / 20
    print(f"{name}: {dt*1e3:.2f} ms/call (K={KT}, check {r})")
