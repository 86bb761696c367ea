"""Angles-stage pipeline A/B: gather from the DEQUAD okey raster (the
shipping layout) vs straight from the QUAAD okey with index-adjusted
static slot arrays (okey_q[y, d*64+x] == okey_f[d][y*64+x]).

Motivation: the isolated angle stage (angles_prof.py, hoist-proofed)
costs ~0.1 ms/256 over a staged okey, yet the pipeline prefix delta
(stage_prof6.py) attributes ~0.56 ms to it — suggesting the cost is the
dequad transpose's second consumer (the gathers force a materialized
[B*D, W*W] layout alongside the stats kernel's), not the gathers/f64
math. If gathering from the quad layout recovers the delta, decode.py
adopts it (the dequad then feeds ONLY pallas_stats, as in the
upto==2 prefix).
"""
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
    frontend_windows_pallas, H_PAD, W_PAD)
from meterelf_tpu.ops.pallas_ccl import propagate_quads

B = 256
REPS = 16
W = DIAL_WIN
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
packed = jax.device_put(jio.pack_crops(
    np.tile(crops_np, (reps_t, 1, 1, 1))[:B], pad_hw=(H_PAD, W_PAD)))
D = pa.mask_full.shape[0]
th, tw = pa.template_zm.shape
origins = tuple((int(x), int(y)) for x, y in np.asarray(pa.win_origin))
centers = tuple((int(x), int(y)) for x, y in np.asarray(pa.centers_int))


def _quad_idx(idx, d):
    return (idx >> 6) * (4 * W) + d * W + (idx & (W - 1))


def stage(mode, pa, pk):
    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    disk_quad = jnp.concatenate(
        [pa.mask_full[i].astype(jnp.int32) for i in range(D)], axis=1)
    max_val, mx, my, bits = frontend_windows_pallas(
        pk, pa.template_u8, tmean, disk_quad,
        pa.color_range, pa.hue_shift, origins, centers)
    okey_q, conv_q = propagate_quads(bits, pack_closed=True)
    okey_f = (okey_q.reshape(B, W, D, W).transpose(0, 2, 1, 3)
              .reshape(B * D, W * W))
    keymax, hasany_f = pallas_stats.stats_select_fused(okey_f)
    if mode == "stats":
        return (keymax.sum().astype(jnp.float32)
                + hasany_f.sum().astype(jnp.float32) + max_val.sum())
    keymax_r = keymax.reshape(B, D)
    if mode == "dequad":
        okey_r = okey_f.reshape(B, D, W * W)
        per_dial = jax.vmap(
            lambda okb, kmb: jax.vmap(
                lambda i: angles_ops.read_dial_from_okey(
                    okb[i], kmb[i],
                    pa.disk_idx[i], pa.disk_valid[i],
                    pa.disk_sx2[i], pa.disk_sy2[i],
                    pa.ann_idx[i], pa.ann_valid[i],
                    pa.ann_x[i], pa.ann_y[i], pa.ann_angle[i],
                    pa.ann_sqd[i], pa.neg_sign[i], pa.zero_turn[i],
                    sum_dtype=jnp.float64))(jnp.arange(D)))(
                        okey_r, keymax_r)
    else:  # quad: gather straight from the CCL kernel's native layout
        okq = okey_q.reshape(B, W * 4 * W)
        per_dial = jax.vmap(
            lambda okb, kmb: jax.vmap(
                lambda i: angles_ops.read_dial_from_okey(
                    okb, kmb[i],
                    _quad_idx(pa.disk_idx[i], i), pa.disk_valid[i],
                    pa.disk_sx2[i], pa.disk_sy2[i],
                    _quad_idx(pa.ann_idx[i], i), pa.ann_valid[i],
                    pa.ann_x[i], pa.ann_y[i], pa.ann_angle[i],
                    pa.ann_sqd[i], pa.neg_sign[i], pa.zero_turn[i],
                    sum_dtype=jnp.float64))(jnp.arange(D)))(
                        okq, keymax_r)
    return per_dial.position.sum().astype(jnp.float32) + max_val.sum()


results = {}
for mode in ("stats", "dequad", "quad", "dequad"):
    @jax.jit
    def rep(pa, pk, mode=mode):
        return lax.map(
            lambda i: stage(mode, pa, pk ^ i),
            jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(pa, packed))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r2 = float(rep(pa, packed))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS * 1e3
    results.setdefault(mode, per)
    print(f"{mode:8s} {per:8.2f} ms/batch   [{r:.6e}]", flush=True)
    if mode == "quad":
        rq = r
    if mode == "dequad":
        rd = r
print("angles delta dequad:", round(results["dequad"] - results["stats"], 3),
      " quad:", round(results["quad"] - results["stats"], 3))
print("checksum equal:", rq == rd)
