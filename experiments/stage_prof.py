"""Amortized per-stage profile of the decode graph.

Each prefix of the pipeline runs REPS times inside ONE jit dispatch
(lax.map), so the ~30 ms axon-tunnel round trip cannot pollute the
numbers (experiments/scorer_prof*.py learned this the hard way).
Stage cost = delta between consecutive prefixes.
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
from meterelf_tpu.ops import color as color_ops
from meterelf_tpu.ops import template as template_ops
from meterelf_tpu.ops import morphology as morph_ops
from meterelf_tpu.ops import components as comp_ops
from meterelf_tpu.ops import angles as angles_ops
from meterelf_tpu.ops.pallas_match import match_scores_pallas
from meterelf_tpu.pipeline import decode as dec_mod

B = 512
REPS = 16
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
paj = jax.tree.map(jnp.asarray, pa)
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps = -(-B // crops_np.shape[0])
crops = jax.device_put(np.tile(crops_np, (reps, 1, 1, 1))[:B])
ok = jax.device_put(np.tile(ok_np, reps)[:B])

th, tw = pa.template_zm.shape
D = pa.mask_full.shape[0]


def stage_fn(upto):
    def run(c_u8):
        lightness = color_ops.lightness_channel(c_u8).astype(jnp.float32)
        if upto == 0:
            return lightness.sum()
        tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
        tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
        scores = match_scores_pallas(
            lightness, jnp.asarray(pa.template_u8), tmean)
        if upto == 1:
            return scores.sum()
        max_val, mx, my = template_ops.locate(scores)
        if upto == 2:
            return max_val.sum() + (mx + my).sum().astype(jnp.float32)
        dials = jax.vmap(
            lambda img, x, y: template_ops.crop_at(img, x, y, th, tw)
        )(c_u8, mx, my)
        if upto == 3:
            return dials.astype(jnp.float32).sum()

        def dial_stage(d, i, stop):
            W = DIAL_WIN
            window_bgr = lax.dynamic_slice(
                d, (paj.win_origin[i][1], paj.win_origin[i][0], jnp.int32(0)),
                (W, W, 3))
            window = color_ops.bgr_to_hls_full(
                window_bgr, pa.hue_shift).astype(jnp.int32)
            core = lax.dynamic_slice(
                window,
                (paj.centers_int[i][1] - 2, paj.centers_int[i][0] - 2,
                 jnp.int32(0)), (5, 5, 3))
            s = jnp.sum(core, axis=(0, 1))
            dial_color = (2 * s + 25) // 50
            lo = jnp.clip(dial_color - paj.color_range[i], 0, 255)
            hi = jnp.clip(dial_color + paj.color_range[i], 0, 255)
            raw = jnp.all((window >= lo) & (window <= hi), axis=-1)
            closed = morph_ops.close3(raw)
            masked = closed & paj.mask_full[i]
            if stop == 0:
                return masked.sum().astype(jnp.float32)
            comp = comp_ops.analyze(masked, closed, paj.mask_full[i])
            if stop == 1:
                return (comp.needle_region.sum().astype(jnp.float32)
                        + comp.has_any.astype(jnp.float32))
            reading = angles_ops.read_dial(
                comp.needle_region.ravel(),
                paj.disk_idx[i], paj.disk_valid[i],
                paj.disk_sx2[i], paj.disk_sy2[i],
                paj.ann_idx[i], paj.ann_valid[i],
                paj.ann_x[i], paj.ann_y[i], paj.ann_angle[i], paj.ann_sqd[i],
                paj.neg_sign[i], paj.zero_turn[i],
                sum_dtype=jnp.float64)
            return reading.position.astype(jnp.float64).sum()

        stop = upto - 4
        out = jax.vmap(lambda d: jax.vmap(
            lambda i: dial_stage(d, i, stop))(jnp.arange(D)))(dials)
        return out.sum().astype(jnp.float32)

    return run


def full_fn(c_u8, o):
    from meterelf_tpu.pipeline.decode import _decode_batch
    r = _decode_batch(pa, c_u8, o, conv_precision="pallas",
                      sum_dtype=jnp.float64)
    return r.value.sum() + r.err.sum().astype(r.value.dtype)


names = ["lightness", "+scorer", "+locate", "+crop", "+win/inRange/close",
         "+CCL", "+angles"]
prev = 0.0
for upto, name in enumerate(names):
    f = stage_fn(upto)

    @jax.jit
    def rep(c):
        return lax.map(lambda i: f(c + i.astype(jnp.uint8)),
                       jnp.arange(REPS, dtype=jnp.uint8)).sum()

    r = float(rep(crops))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(crops))
        ts.append(time.time() - t0)
    per = min(ts) * 1e3 / REPS
    print(f"{name:22s} cum {per:7.2f} ms   delta {per - prev:7.2f} ms")
    prev = per


@jax.jit
def rep_full(c, o):
    return lax.map(lambda i: full_fn(c + i.astype(jnp.uint8), o),
                   jnp.arange(REPS, dtype=jnp.uint8)).sum()


r = float(rep_full(crops, ok))
ts = []
for _ in range(4):
    t0 = time.time()
    r = float(rep_full(crops, ok))
    ts.append(time.time() - t0)
print(f"{'FULL decode':22s} cum {min(ts)*1e3/REPS:7.2f} ms")
