"""Stage-prefix profile of the device JPEG back-half (ops/jpegdec.py).

Prefixes are timed with the loop-index-xor lax.map harness; DELTAS
between consecutive prefixes are the stage costs (the dispatch floor
cancels — docs/performance.md measurement discipline).

Usage: python experiments/jpegdec_prof.py [BATCH]
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meterelf_tpu.io import jpeg as jio
    from meterelf_tpu.params import load as load_params
    from meterelf_tpu.ops import jpegdec as jd

    params = load_params("/root/reference/sample-images1/params.yml")
    win = jd.coef_window(params.meter_rect, 480, 640)
    pad_hw = jio.frontend_pad_hw()

    files = sorted(glob.glob("/root/reference/sample-images1/*.jpg"))
    datas = [open(f, "rb").read() for f in files]
    reps_b = -(-BATCH // len(datas))
    cy, cb, cr, qt, ok = jio.read_coefs_batch(
        (datas * reps_b)[:BATCH], win, (480, 640),
        num_threads=os.cpu_count() or 1)
    cy, cb, cr, qt = [jax.device_put(a) for a in (cy, cb, cr, qt)]
    jax.block_until_ready(cy)

    cbh, cbw = win.lbh // 2, win.lbw // 2

    def p_idct_y(cy, cb, cr, qt):
        return jd.idct_blocks(cy, qt[:, 0]).sum(dtype=jnp.int32)

    def p_idct_all(cy, cb, cr, qt):
        return (jd.idct_blocks(cy, qt[:, 0]).sum(dtype=jnp.int32)
                + jd.idct_blocks(cb, qt[:, 1]).sum(dtype=jnp.int32)
                + jd.idct_blocks(cr, qt[:, 2]).sum(dtype=jnp.int32))

    def p_planes(cy, cb, cr, qt):
        sy = jd._blocks_to_plane(jd.idct_blocks(cy, qt[:, 0]),
                                 win.lbh, win.lbw)
        scb = jd._blocks_to_plane(jd.idct_blocks(cb, qt[:, 1]), cbh, cbw)
        scr = jd._blocks_to_plane(jd.idct_blocks(cr, qt[:, 2]), cbh, cbw)
        return (sy.sum(dtype=jnp.int32) + scb.sum(dtype=jnp.int32)
                + scr.sum(dtype=jnp.int32))

    def p_upsample(cy, cb, cr, qt):
        sy = jd._blocks_to_plane(jd.idct_blocks(cy, qt[:, 0]),
                                 win.lbh, win.lbw)
        scb = jd._blocks_to_plane(jd.idct_blocks(cb, qt[:, 1]), cbh, cbw)
        scr = jd._blocks_to_plane(jd.idct_blocks(cr, qt[:, 2]), cbh, cbw)
        ucb = jd._upsample_h2v2_fancy(scb, win.ch_valid, win.cw_valid)
        ucr = jd._upsample_h2v2_fancy(scr, win.ch_valid, win.cw_valid)
        return (sy.sum(dtype=jnp.int32) + ucb.sum(dtype=jnp.int32)
                + ucr.sum(dtype=jnp.int32))

    def p_full(cy, cb, cr, qt):
        return jd.backhalf_to_packed(cy, cb, cr, qt, win,
                                     pad_hw=pad_hw).sum(dtype=jnp.int32)

    stages = [("idct Y", p_idct_y), ("idct all", p_idct_all),
              ("to planes", p_planes), ("+upsample", p_upsample),
              ("full(pack)", p_full)]

    prev = 0.0
    for name, fn in stages:
        @jax.jit
        def harness(cy, cb, cr, qt, fn=fn):
            def body(i):
                cyx = cy.at[:, 0, 0].set(
                    cy[:, 0, 0] ^ i.astype(jnp.int16))
                return fn(cyx, cb, cr, qt)
            return lax.map(body, jnp.arange(REPS, dtype=jnp.int32)).sum()

        _ = int(harness(cy, cb, cr, qt))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _ = int(harness(cy, cb, cr, qt))
            best = min(best, time.time() - t0)
        ms = best / REPS * 1e3
        print(f"{name:12s}: prefix {ms:7.3f} ms/b{BATCH}   "
              f"delta {ms - prev:+7.3f}")
        prev = ms


if __name__ == "__main__":
    main()
