"""Quad-CCL cost anatomy: fixed (prologue/rids/epilogue) vs per-pass.

Times propagate_quads on inputs of increasing convergence depth —
empty masks (1 pass each phase), corpus-like blobs, dense noise — with
a hoist-proof harness (bits XORed with the loop index would corrupt
the packing, so instead the window content is jnp.roll'ed by the loop
index: same mask population per iteration, no CSE).

ROUND-5 CAVEAT (docs/performance.md, measurement discipline): the
harness BODY — the batch roll plus the okey/conv reduces — costs
0.394 ms/256 BY ITSELF (measured with the kernel deleted), so the
absolute numbers here overstate the kernel by that constant; only
DELTAS between runs of this same harness are clean. The true shipping
kernel costs are ~(printed - 0.39). Stage-level attribution lives in
experiments/ccl_floor_anatomy.py."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from meterelf_tpu.ops.pallas_ccl import propagate_quads

W = 64
B = 256
rng = np.random.default_rng(7)
yy, xx = np.mgrid[:W, :W]
disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2


def quadify(masked, closed_disk):
    bits = masked.astype(np.int32) + 2 * closed_disk.astype(np.int32)
    return bits.reshape(B, 4, W, W).transpose(0, 2, 1, 3).reshape(
        B, W, 4 * W)


def make(kind):
    m = np.zeros((B * 4, W, W), bool)
    if kind == "empty":
        pass
    elif kind == "blobs":
        for k in range(B * 4):
            cy, cx = rng.integers(16, 48, 2)
            a, b = rng.integers(3, 12, 2)
            m[k] = ((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2 <= 1.0
    elif kind == "noise":
        m = rng.random((B * 4, W, W)) < 0.35
    m &= disk
    return quadify(m, np.broadcast_to(disk, (B * 4, W, W)))


REPS = 96  # keep the ~30 ms dispatch floor under 0.35 ms/iter
for kind in ("empty", "blobs", "noise"):
    bits = jax.device_put(jnp.asarray(make(kind)))

    @jax.jit
    def run(bq):
        def step(i):
            b = jnp.roll(bq, i, axis=0)
            okey, conv = propagate_quads(b)
            return okey.sum() + conv.sum().astype(jnp.int32)
        return lax.map(step, jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = int(run(bits))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = int(run(bits))
        ts.append(time.time() - t0)
    dt = min(ts) / REPS
    print(f"{kind:6s}: {dt*1e3:6.2f} ms/batch256  [{r}]")
