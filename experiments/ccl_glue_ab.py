"""A/B: lockstep CCL glue schedule — glue (min3x3 + any4) in both
halves (shipping) vs forward-half only (METERELF_CCL_GLUE=fwd, rev half
runs the segmented sweeps alone, ~38% cheaper per rev half, pair-level
convergence certificate). Parity contract: converged windows must be
bit-identical (unique fixpoint); convergence-rate drops show up as conv
flag diffs and are reported (capped windows route to rescue in
production)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

import meterelf_tpu.ops.pallas_ccl as ccl

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
    if kind == "blobs":
        for k in range(B * 4):
            cy, cx = rng.integers(16, 48, 2)
            a, b = rng.integers(3, 12, 2)
            m[k] = ((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2 <= 1.0
    elif kind == "noise":
        m = rng.random((B * 4, W, W)) < 0.35
    m &= disk
    return quadify(m, np.broadcast_to(disk, (B * 4, W, W)))


REPS = 96
inputs = {k: jax.device_put(jnp.asarray(make(k)))
          for k in ("empty", "blobs", "noise")}

results = {}
ref_out = {}
for glue in ("both", "fwd"):
    ccl._GLUE = glue   # read at trace time

    def prop(bq, _g=glue):
        return ccl.propagate_quads(bq)

    for kind, bits in inputs.items():
        okey, conv = jax.jit(prop)(bits)
        okey, conv = np.asarray(okey), np.asarray(conv)
        if glue == "both":
            ref_out[kind] = (okey, conv)
        else:
            ok0, cv0 = ref_out[kind]
            both = conv & cv0
            # converged-in-both windows: unique fixpoint -> identical
            okq = okey.reshape(B, W, 4, W)
            ok0q = ok0.reshape(B, W, 4, W)
            for d in range(4):
                sel = both[:, d]
                assert np.array_equal(okq[sel, :, d], ok0q[sel, :, d]), (
                    kind, d)
            print(f"  {kind}: conv both={cv0.mean():.4f} "
                  f"fwd={conv.mean():.4f}", flush=True)

        @jax.jit
        def run(bq, _g=glue):
            def step(i):
                b = jnp.roll(bq, i, axis=0)
                okey, conv = ccl.propagate_quads(b)
                return okey.sum() + conv.sum().astype(jnp.int32)
            return lax.map(step, jnp.arange(REPS, dtype=jnp.int32)).sum()

        r = int(run(bits))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = int(run(bits))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / REPS * 1e3
        results[(glue, kind)] = per
        print(f"glue={glue:4s} {kind:6s} {per:7.3f} ms/256", flush=True)

for kind in inputs:
    a, b = results[("both", kind)], results[("fwd", kind)]
    print(f"{kind:6s}: both {a:.3f} -> fwd {b:.3f} "
          f"({(a - b) / a * 100:+.1f}%)")
