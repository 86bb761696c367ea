"""A/B: lockstep CCL with vs without the skip-rev certify optimization
(pallas_ccl._SKIPREV — the reverse half of a pair is skipped via
in-kernel lax.cond when the forward half was a no-op for every live
phase). Bit-parity asserted on okey AND conv for all three input
populations, then floor-amortized timing (same harness discipline as
ccl_cost_split.py: the window content rolls by the loop index so XLA
cannot hoist the body)."""
import importlib
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
for variant in (False, True):
    ccl._SKIPREV = variant   # read at trace time

    # distinct defs per variant: a shared jitted fn would cache the
    # first variant's trace and silently time it twice
    def prop(bq, _v=variant):
        return ccl.propagate_quads(bq)

    for kind, bits in inputs.items():
        okey, conv = jax.jit(prop)(bits)
        okey, conv = np.asarray(okey), np.asarray(conv)
        if not variant:
            ref_out[kind] = (okey, conv)
        else:
            assert np.array_equal(okey, ref_out[kind][0]), kind
            assert np.array_equal(conv, ref_out[kind][1]), kind

        @jax.jit
        def run(bq, _v=variant):
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
        results[(variant, kind)] = per
        print(f"skiprev={int(variant)} {kind:6s} {per:7.3f} ms/256",
              flush=True)

for kind in inputs:
    a, b = results[(False, kind)], results[(True, kind)]
    print(f"{kind:6s}: base {a:.3f} -> skiprev {b:.3f} "
          f"({(a - b) / a * 100:+.1f}%)")
print("bit-parity: OK (asserted above)")
