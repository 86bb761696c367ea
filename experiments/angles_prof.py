"""Angles-stage anatomy: read_dial_from_okey isolated at pipeline
shape (B=256, D=4) over the real corpus okey3 rasters. Variants cut
the stage at successive points; an f64-vs-f32 accumulate A/B shows the
emulated-f64 share (informative only — exact mode ships f64).

NOTE: the four vmap(vmap(gather))+f64 graphs compile VERY slowly over
the axon tunnel — budget 10+ minutes wall clock for a full run. The
stage is ~0.56 ms/256 (13% of the batch) per stage_prof6, so this
harness is for targeted follow-up only."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from glob import glob
from meterelf_tpu.params import Params, DIAL_WIN
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.ops import angles as angles_ops
from meterelf_tpu.ops import pallas_stats
from meterelf_tpu.ops.pallas_frontend import (
    frontend_windows_pallas, STAGE)
from meterelf_tpu.ops.pallas_ccl import propagate_quads

B, REPS, W, D = 256, 32, DIAL_WIN, 4
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = jax.device_put(params.arrays())  # jnp fields: vmap-traced dial indexing
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, _ = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
packed = jax.device_put(jio.pack_crops(
    np.tile(crops_np, (reps_t, 1, 1, 1))[:B], pad_hw=(STAGE, STAGE)))
origins = tuple((int(x), int(y)) for x, y in np.asarray(pa.win_origin))
centers = tuple((int(x), int(y)) for x, y in np.asarray(pa.centers_int))
th, tw = pa.template_zm.shape


@jax.jit
def mk(pa, pk):
    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    disk_quad = jnp.concatenate(
        [pa.mask_full[i].astype(jnp.int32) for i in range(D)], axis=1)
    _, _, _, bits = frontend_windows_pallas(
        pk, pa.template_u8, tmean, disk_quad, pa.color_range,
        pa.hue_shift, origins, centers)
    okey_q, _ = propagate_quads(bits, pack_closed=True)
    okey_f = (okey_q.reshape(B, W, D, W).transpose(0, 2, 1, 3)
              .reshape(B * D, W * W))
    keymax, _ = pallas_stats.stats_select_fused(okey_f)
    return okey_f.reshape(B, D, W * W), keymax.reshape(B, D)

okey_r, keymax_r = map(jax.device_put, map(np.asarray, mk(pa, packed)))


def stage(okb, kmb, i, mode, acc):
    # hoist-proofing: the body MUST depend on the loop index or XLA
    # lifts it out of the lax.map and the harness measures dispatch
    # floor / REPS for any body (docs/performance.md measurement
    # discipline). An earlier edition used `^ (i * 0)` — constant-folded
    # to a no-op, so its numbers were pure floor. The xor flips one
    # okey low bit; work content is unchanged to timing precision.
    okb = okb.at[0, 0, 0].set(okb[0, 0, 0] ^ i)

    def dial(ok1, km1, i_d):
        i32 = jnp.int32
        valid = km1 >= i32(0)
        big = valid & ((km1 >> 12) > i32(200))
        sel = km1 & i32(4095)

        def region(ok):
            return jnp.where(big, (ok >> 3) == sel, (ok & i32(4)) != 0)

        needle = region(ok1[pa.disk_idx[i_d]]) & pa.disk_valid[i_d]
        tip = region(ok1[pa.ann_idx[i_d]]) & pa.ann_valid[i_d]
        if mode == "gathers":
            return needle.sum().astype(jnp.float64) + tip.sum()
        if mode == "momentum":
            f = pa.disk_sx2[i_d].dtype
            mom_x = jnp.sum(jnp.where(needle, pa.disk_sx2[i_d],
                                      f.type(0)).astype(acc))
            mom_y = jnp.sum(jnp.where(needle, pa.disk_sy2[i_d],
                                      f.type(0)).astype(acc))
            return mom_x + mom_y + tip.sum().astype(acc)
        r = angles_ops._read_dial_core(
            needle, tip, pa.disk_sx2[i_d], pa.disk_sy2[i_d],
            pa.ann_x[i_d], pa.ann_y[i_d], pa.ann_angle[i_d],
            pa.ann_sqd[i_d], pa.neg_sign[i_d], pa.zero_turn[i_d],
            sum_dtype=acc)
        return r.position.astype(jnp.float64)

    per = jax.vmap(lambda ok4, km4: jax.vmap(
        lambda i_d: dial(ok4[i_d], km4[i_d], i_d))(jnp.arange(D)))(
            okb, kmb)
    return per.sum()


for mode, acc in (("gathers", jnp.float64), ("momentum", jnp.float64),
                  ("full-f64", jnp.float64), ("full-f32", jnp.float32)):
    m = mode.split("-")[0] if mode.startswith("full") else mode

    @jax.jit
    def rep(okb, kmb, m=m, acc=acc):
        return lax.map(lambda i: stage(okb, kmb, i, m, acc),
                       jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(okey_r, keymax_r))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(okey_r, keymax_r))
        ts.append(time.perf_counter() - t0)
    print(f"{mode:10s} {min(ts)/REPS*1e3:7.2f} ms/batch")
