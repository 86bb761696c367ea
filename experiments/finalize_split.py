"""Where does _finalize's time go? Amortized per-piece timing at the
decode shape (K=1024): cell-contrib, the stats kernel alone, the
fill/where tail, and both full variants."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from meterelf_tpu.ops import components as comp_ops
from meterelf_tpu.ops import pallas_stats

W = 64
N = W * W
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

KT = 1024
okey, conv = jax.jit(comp_ops._propagate_xla)(
    jnp.asarray(np.tile(masked, (4, 1, 1))),
    jnp.asarray(np.tile(diskb, (4, 1, 1))))
okey = jax.device_put(np.asarray(okey, np.int32))
mk = jax.device_put(np.tile(masked, (4, 1, 1)))
cl = jax.device_put(np.tile(closed, (4, 1, 1)))
cv = jax.device_put(np.ones(KT, bool))
D = 4
bbox = (tuple((8, 8) for _ in range(D)), 48)

# precomputed kernel inputs for the kernel-alone row
owner_full = np.asarray(okey) >> 2
contrib_np = np.asarray(
    jax.jit(lambda o: comp_ops._cell_contrib(o, N))(owner_full >> 0))
contrib_dev = jax.device_put(contrib_np.astype(np.int32))
sel_np = rng.integers(0, N, KT).astype(np.int32)
sel_dev = jax.device_put(sel_np)
big_dev = jax.device_put((sel_np % 3 == 0))

REPS = 20


def timeit(name, fn, *args):
    # the first arg is XORed with the loop index so XLA cannot hoist
    # the loop-invariant body out of the map (the tunnel-latency trap)
    jfn = jax.jit(lambda a0, *rest: lax.map(
        lambda i: fn(a0 ^ i, *rest),
        jnp.arange(REPS, dtype=args[0].dtype)).sum())
    r = float(jfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = float(jfn(*args))
        ts.append(time.time() - t0)
    dt = min(ts) / REPS
    print(f"{name:24s} {dt*1e3:6.2f} ms  [{r:.3e}]")


timeit("contrib alone", lambda o: comp_ops._cell_contrib(
    o >> 2, N).sum(), okey)
timeit("kernel alone", lambda o, c: pallas_stats.stats_select(
    o, c).astype(jnp.float32).sum(), okey, contrib_dev)
timeit("contrib+kernel", lambda o: pallas_stats.stats_select(
    o, comp_ops._cell_contrib(o >> 2, N)).astype(jnp.float32).sum(), okey)


def fill_tail(o, c, sel, big):
    owner = o >> 2
    fill_sel = (owner == sel[:, None, None]) & (sel[:, None, None] < N)
    nr = jnp.where(big[:, None, None], fill_sel, c)
    return nr.sum()


timeit("fill/where tail", fill_tail, okey, cl, sel_dev, big_dev)
timeit("full hist_pallas", lambda o, m, c, v: comp_ops._finalize(
    o, m, c, v, stats="hist_pallas").needle_region.sum(), okey, mk, cl, cv)
timeit("full sort+bbox", lambda o, m, c, v: comp_ops._finalize(
    o, m, c, v, static_bbox=bbox, stats="sort").needle_region.sum(),
    okey, mk, cl, cv)
