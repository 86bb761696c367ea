"""Device cost of the JPEG back-half (ops/jpegdec.py) on TPU.

Stages the corpus' coefficient windows once, then times (a) the
back-half alone and (b) back-half + full dial decode, as lax.map replays
inside one dispatch (dispatch-floor rules, docs/performance.md). Prints
ms/batch and the implied img/s for the backhalf-included capacity.

Usage: python experiments/jpegdec_devcost.py [BATCH]
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meterelf_tpu.io import jpeg as jio
    from meterelf_tpu.params import load as load_params
    from meterelf_tpu.pipeline.decode import (MeterDecoder,
                                              make_coef_decode_fn)
    from meterelf_tpu.ops import jpegdec

    params = load_params("/root/reference/sample-images1/params.yml")
    dec = MeterDecoder(params)
    step, win, pad_hw = make_coef_decode_fn(dec, (480, 640))

    files = sorted(glob.glob("/root/reference/sample-images1/*.jpg"))
    datas = [open(f, "rb").read() for f in files]
    reps = -(-BATCH // len(datas))
    feed = jio.load_coef_feed(
        (datas * reps)[:BATCH], params.meter_rect, (480, 640), pad_hw,
        num_threads=os.cpu_count() or 1)
    cy, cb, cr, qt, ok, fbp, fbi = [jax.device_put(a) for a in feed]
    pa = jax.device_put(dec.param_arrays)
    jax.block_until_ready((cy, pa))

    REPS = 64

    plane = cy.shape[1:] == (win.lbh * 8, win.lbw * 8)
    bh_fn = (jpegdec.backhalf_planes_to_packed if plane
             else jpegdec.backhalf_to_packed)
    print(f"coef feed layout: {'frequency-plane (fused kernel)' if plane else 'blocks (XLA)'}")

    @jax.jit
    def bh_only(cy, cb, cr, qt):
        def body(i):
            # xor the dc coefficient with the loop index so XLA cannot
            # hoist the loop-invariant body (docs/performance.md)
            cyx = cy.at[:, 0, 0].set(cy[:, 0, 0] ^ i.astype(jnp.int16))
            p = bh_fn(cyx, cb, cr, qt, win, pad_hw=pad_hw)
            return p.sum(dtype=jnp.int32)
        return lax.map(body, jnp.arange(REPS, dtype=jnp.int32)).sum()

    @jax.jit
    def full(cy, cb, cr, qt, ok, fbp, fbi):
        def body(i):
            cyx = cy.at[:, 0, 0].set(cy[:, 0, 0] ^ i.astype(jnp.int16))
            r = step(pa, cyx, cb, cr, qt, ok, fbp, fbi)
            return r.value.sum() + r.err.sum().astype(r.value.dtype)
        return lax.map(body, jnp.arange(REPS, dtype=jnp.int32)).sum()

    for name, fn, args in [
        ("backhalf-only", bh_only, (cy, cb, cr, qt)),
        ("backhalf+decode", full, (cy, cb, cr, qt, ok, fbp, fbi)),
    ]:
        _ = float(np.asarray(fn(*args)))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _ = float(np.asarray(fn(*args)))
            best = min(best, time.time() - t0)
        ms = best / REPS * 1e3
        print(f"{name:16s}: {ms:7.3f} ms/batch of {BATCH} "
              f"({BATCH / (best / REPS):9.1f} img/s)")


if __name__ == "__main__":
    main()
