"""Amortized per-stage profile of the CURRENT fused-frontend decode
graph (pipeline/decode.py use_frontend path). Cost of each stage =
delta between consecutive jitted prefixes, each run REPS times inside
ONE dispatch (the axon tunnel costs ~30 ms/dispatch; see
docs/performance.md "Measurement discipline")."""
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
from meterelf_tpu.ops import components as comp_ops
from meterelf_tpu.ops.pallas_frontend import frontend_pallas, H_PAD, W_PAD
from meterelf_tpu.pipeline.decode import (
    _dial_masks_from_packed_window, _stats_bbox)

B = 512
REPS = 16
W = DIAL_WIN
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
packed_np = jio.pack_crops(
    np.tile(crops_np, (reps_t, 1, 1, 1))[:B], pad_hw=(H_PAD, W_PAD))
packed = jax.device_put(packed_np)
D = pa.mask_full.shape[0]
th, tw = pa.template_zm.shape
win_origin_static = tuple((int(x), int(y)) for x, y in np.asarray(pa.win_origin))
static_bbox = _stats_bbox(pa.mask_full)


def stage(upto, pa, pk):
    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    max_val, mx, my, sw = frontend_pallas(pk, pa.template_u8, tmean)
    if upto == 0:
        return max_val.sum() + (mx + my).sum().astype(jnp.float32)
    masked_l, closed_l = [], []
    for i in range(D):
        ox, oy = win_origin_static[i]
        win_pk = sw[:, oy:oy + W, ox:ox + W]
        m, c = jax.vmap(
            lambda wp, i=i: _dial_masks_from_packed_window(
                wp, pa.color_range[i], pa.centers_int[i],
                pa.mask_full[i], pa.hue_shift))(win_pk)
        masked_l.append(m)
        closed_l.append(c)
    masked = jnp.stack(masked_l, axis=1)
    closed = jnp.stack(closed_l, axis=1)
    if upto == 1:
        return masked.sum().astype(jnp.float32) + max_val.sum()
    from meterelf_tpu.ops.pallas_ccl import propagate
    okey, converged = propagate(
        masked.reshape(B * D, W, W),
        jnp.broadcast_to(pa.mask_full[None], (B, D, W, W)).reshape(B * D, W, W))
    if upto == 2:
        return okey.sum().astype(jnp.float32) + max_val.sum()
    comp = comp_ops._finalize(
        okey, masked.reshape(B * D, W, W), closed.reshape(B * D, W, W),
        converged, static_bbox=static_bbox)
    needle = comp.needle_region.reshape(B, D, W * W)
    if upto == 3:
        return needle.sum().astype(jnp.float32) + max_val.sum()
    per_dial = jax.vmap(
        lambda nr: jax.vmap(
            lambda i: angles_ops.read_dial(
                nr[i], pa.disk_idx[i], pa.disk_valid[i],
                pa.disk_sx2[i], pa.disk_sy2[i],
                pa.ann_idx[i], pa.ann_valid[i],
                pa.ann_x[i], pa.ann_y[i], pa.ann_angle[i], pa.ann_sqd[i],
                pa.neg_sign[i], pa.zero_turn[i],
                sum_dtype=jnp.float64))(jnp.arange(D)))(needle)
    if upto == 4:
        return per_dial.position.sum().astype(jnp.float32) + max_val.sum()
    value = jax.vmap(
        lambda p: angles_ops.assemble_value(p[pa.value_perm])
    )(per_dial.position)
    return value.sum().astype(jnp.float32) + max_val.sum()


names = ["frontend", "+windows", "+ccl-prop", "+stats", "+angles", "+value"]
prev = 0.0
for upto, name in enumerate(names):
    @jax.jit
    def rep(pa, pk):
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
    print(f"{name:12s} {per:8.2f} ms/batch  (+{per - prev:6.2f})   [{r:.3e}]")
    prev = per
