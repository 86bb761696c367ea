"""Amortized per-stage profile of the SHIPPING split quad pipeline
(round 4: frontend kernel -> window-mask kernel -> quad CCL -> fused
stats -> QUAD-GATHER angles -> value). Successor to stage_prof6 (which
profiles the merged-frontend variant). Cost = delta between consecutive
jitted prefixes, REPS inside ONE dispatch, body depends on the real
loop index (see docs/performance.md measurement discipline)."""
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
from meterelf_tpu.ops.pallas_frontend import frontend_pallas, STAGE
from meterelf_tpu.ops.pallas_windows import window_bits_quads
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
    np.tile(crops_np, (reps_t, 1, 1, 1))[:B], pad_hw=(STAGE, STAGE)))
D = pa.mask_full.shape[0]
th, tw = pa.template_zm.shape
origins = tuple((int(x), int(y)) for x, y in np.asarray(pa.win_origin))
centers = tuple((int(x), int(y)) for x, y in np.asarray(pa.centers_int))


def _quad_idx(idx, d):
    return ((idx >> 6) * jnp.int32(D * W)
            + d.astype(jnp.int32) * jnp.int32(W)
            + (idx & jnp.int32(W - 1)))


def stage(upto, pa, pk):
    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    max_val, mx, my, sw = frontend_pallas(
        pk, pa.template_u8, tmean, crop_hw=(250, 250))
    if upto == 0:
        return sw.sum().astype(jnp.float32) + max_val.sum()
    disk_quad = jnp.concatenate(
        [pa.mask_full[i].astype(jnp.int32) for i in range(D)], axis=1)
    bits = window_bits_quads(sw, disk_quad, pa.color_range,
                             pa.hue_shift, origins, centers)
    if upto == 1:
        return bits.sum().astype(jnp.float32) + max_val.sum()
    # mirrors the shipping _CCL_DEQUAD=1 path: the kernel emits the
    # flat layout for the stats kernel itself
    okey_q, conv_q, okey_kflat = propagate_quads(
        bits, pack_closed=True, emit_flat=True)
    if upto == 2:
        return okey_q.sum().astype(jnp.float32) + max_val.sum()
    okey_f = okey_kflat.reshape(B * D, W * W)
    keymax, hasany_f = pallas_stats.stats_select_fused(okey_f)
    if upto == 3:
        return (keymax.sum().astype(jnp.float32)
                + hasany_f.sum().astype(jnp.float32) + max_val.sum())
    keymax_r = keymax.reshape(B, D)
    okq = okey_q.reshape(B, W * D * W)
    per_dial = jax.vmap(
        lambda okb, kmb: jax.vmap(
            lambda i: angles_ops.read_dial_from_okey(
                okb, kmb[i],
                _quad_idx(pa.disk_idx[i], i), pa.disk_valid[i],
                pa.disk_sx2[i], pa.disk_sy2[i],
                _quad_idx(pa.ann_idx[i], i), pa.ann_valid[i],
                pa.ann_x[i], pa.ann_y[i], pa.ann_angle[i],
                pa.ann_sqd[i], pa.neg_sign[i], pa.zero_turn[i],
                sum_dtype=jnp.float64))(jnp.arange(D)))(okq, keymax_r)
    if upto == 4:
        return per_dial.position.sum().astype(jnp.float32) + max_val.sum()
    value = jax.vmap(
        lambda p: angles_ops.assemble_value(p[pa.value_perm])
    )(per_dial.position)
    return value.sum().astype(jnp.float32) + max_val.sum()


names = ["frontend", "+windows", "+quad-ccl", "+fused-stats",
         "+angles(quad)", "+value"]
prev = 0.0
for upto, name in enumerate(names):
    @jax.jit
    def rep(pa, pk, upto=upto):
        return lax.map(
            lambda i: stage(upto, pa, pk ^ i),
            jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(pa, packed))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(pa, packed))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS * 1e3
    print(f"{name:14s} {per:8.2f} ms/batch  (+{per - prev:6.2f})   "
          f"[{r:.3e}]", flush=True)
    prev = per
