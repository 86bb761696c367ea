"""Amortized per-stage profile of the NEW decode graph (planar +
analyze_batch). Cost = delta between consecutive prefixes."""
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
from meterelf_tpu.ops import color as color_ops
from meterelf_tpu.ops import template as template_ops
from meterelf_tpu.ops import components as comp_ops
from meterelf_tpu.ops import angles as angles_ops
from meterelf_tpu.ops.pallas_match import match_scores_pallas
from meterelf_tpu.pipeline.decode import _dial_window_masks, _decode_batch

B = 512
REPS = 16
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa_np = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps = -(-B // crops_np.shape[0])
crops = jax.device_put(np.tile(crops_np, (reps, 1, 1, 1))[:B])
ok = jax.device_put(np.tile(ok_np, reps)[:B])
th, tw = pa_np.template_zm.shape
D = pa_np.mask_full.shape[0]
W = DIAL_WIN


def stage(upto, pa, c_u8):
    planar = jnp.transpose(c_u8, (0, 3, 1, 2))
    lightness = color_ops.lightness_from_planes(
        planar[:, 0], planar[:, 1], planar[:, 2]).astype(jnp.float32)
    if upto == 0:
        return lightness.sum()
    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    scores = match_scores_pallas(lightness, pa.template_u8, tmean)
    if upto == 1:
        return scores.sum()
    max_val, mx, my = template_ops.locate(scores)
    masked, closed = jax.vmap(
        lambda img, x, y: jax.vmap(
            lambda i: _dial_window_masks(
                img, x, y, pa.color_range[i], pa.centers_int[i],
                pa.win_origin[i], pa.mask_full[i], pa.hue_shift))
        (jnp.arange(D)))(planar, mx, my)
    if upto == 2:
        return masked.sum() + closed.sum()
    disk_b = jnp.broadcast_to(pa.mask_full[None], (B, D, W, W))
    comp = comp_ops.analyze_batch(
        masked.reshape(B * D, W, W), closed.reshape(B * D, W, W),
        disk_b.reshape(B * D, W, W))
    if upto == 3:
        return (comp.needle_region.sum()
                + comp.has_any.sum() + comp.converged.sum())
    needle = comp.needle_region.reshape(B, D, W * W)
    per_dial = jax.vmap(lambda nr: jax.vmap(
        lambda i: angles_ops.read_dial(
            nr[i], pa.disk_idx[i], pa.disk_valid[i],
            pa.disk_sx2[i], pa.disk_sy2[i],
            pa.ann_idx[i], pa.ann_valid[i],
            pa.ann_x[i], pa.ann_y[i], pa.ann_angle[i], pa.ann_sqd[i],
            pa.neg_sign[i], pa.zero_turn[i], sum_dtype=jnp.float64))
        (jnp.arange(D)))(needle)
    return per_dial.position.sum()


names = ["planar+lightness", "+scorer", "+windows", "+analyze_batch",
         "+angles"]
prev = 0.0
for upto, name in enumerate(names):
    @jax.jit
    def rep(pa, c):
        return lax.map(
            lambda i: stage(upto, pa, c + i.astype(jnp.uint8)),
            jnp.arange(REPS, dtype=jnp.uint8)).sum().astype(jnp.float32)

    r = float(rep(pa_np, crops))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(pa_np, crops))
        ts.append(time.time() - t0)
    per = min(ts) * 1e3 / REPS
    print(f"{name:20s} cum {per:7.2f} ms   delta {per - prev:7.2f} ms")
    prev = per


@jax.jit
def rep_full(pa, c, o):
    def f(i):
        r = _decode_batch(pa, c + i.astype(jnp.uint8), o,
                          conv_precision="pallas", sum_dtype=jnp.float64)
        return r.value.sum() + r.err.sum().astype(r.value.dtype)
    return lax.map(f, jnp.arange(REPS, dtype=jnp.uint8)).sum()


r = float(rep_full(pa_np, crops, ok))
ts = []
for _ in range(4):
    t0 = time.time()
    r = float(rep_full(pa_np, crops, ok))
    ts.append(time.time() - t0)
print(f"{'FULL decode':20s} cum {min(ts)*1e3/REPS:7.2f} ms")
