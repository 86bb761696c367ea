"""Isolate the two primitives the shear formulation leans on:
(a) i8 lane-shear via i32-bitcast roll; (b) strided roll with stride>1.
Compare each against numpy on the real chip."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

rng = np.random.default_rng(3)


def probe_a():
    x = rng.integers(-128, 128, (224, 256), np.int8)

    def kern(x_ref, o_ref):
        sl = x_ref[...]
        w = pltpu.bitcast(sl, jnp.int32)
        for j in range(16):
            o_ref[j * 224:(j + 1) * 224, :] = (
                sl if j == 0 else
                pltpu.bitcast(pltpu.roll(w, 256 - j, 1), jnp.int8))

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16 * 224, 256), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    out = np.asarray(out)
    for j in range(16):
        want = np.roll(x, -j, axis=1)   # sh_j[c, l] = x[c, l+j]
        got = out[j * 224:(j + 1) * 224]
        if not (got == want).all():
            # diagnose: what shift DID we get?
            for sh in range(-20, 21):
                if (got == np.roll(x, sh, axis=1)).all():
                    print(f"probe A j={j}: got shift {sh}, want {-j}")
                    break
            else:
                print(f"probe A j={j}: MISMATCH, not a pure lane shift")
                # check row mixing: does row c match any rolled row?
                bad = np.argwhere(got != want)
                print("  first bad:", bad[:3], got[bad[0][0], bad[0][1]],
                      want[bad[0][0], bad[0][1]])
            return
    print("probe A: PASS (all 16 shears exact)")


def probe_b(stride):
    x = rng.integers(-10**6, 10**6, (8, 256), np.int32)

    def kern(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 0, 1, stride=stride,
                                stride_axis=0)

    out = np.asarray(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x)))
    want = np.stack([np.roll(x[r], stride * r) for r in range(8)])
    if (out == want).all():
        print(f"probe B stride={stride}: PASS")
    else:
        for r in range(8):
            for sh in range(-130, 131):
                if (out[r] == np.roll(x[r], sh)).all():
                    print(f"  row {r}: got shift {sh}, want {stride*r}")
                    break
            else:
                print(f"  row {r}: not a pure shift")


if __name__ == "__main__":
    probe_a()
    probe_b(1)
    probe_b(16)
