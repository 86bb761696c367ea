"""Parity + timing for the fused frontend kernel (pallas_frontend.py)
vs the current XLA composition (planar L -> fused matcher -> locate ->
window slices)."""
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
from meterelf_tpu.ops.pallas_match2 import match_scores_pallas_fused
from meterelf_tpu.ops.pallas_frontend import frontend_pallas, SW_H, SW_W

B = 512
REPS = 16
W = DIAL_WIN
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps = -(-B // crops_np.shape[0])
crops = np.tile(crops_np, (reps, 1, 1, 1))[:B]
packed_np = (crops[..., 0].astype(np.int32)
             | (crops[..., 1].astype(np.int32) << 8)
             | (crops[..., 2].astype(np.int32) << 16))
packed = jax.device_put(packed_np)
crops_d = jax.device_put(crops)
th, tw = pa.template_zm.shape
tmean = float(pa.template_u8.astype(np.int64).sum()) / (th * tw)
D = pa.mask_full.shape[0]


@jax.jit
def reference(pa, c_u8):
    planar = jnp.transpose(c_u8, (0, 3, 1, 2))
    lightness = color_ops.lightness_from_planes(
        planar[:, 0], planar[:, 1], planar[:, 2]).astype(jnp.float32)
    scores = match_scores_pallas_fused(
        lightness, pa.template_u8, jnp.float32(tmean))
    max_val, mx, my = template_ops.locate(scores)
    # superwindow via per-image dynamic slice on padded planar
    pl_pad = jnp.pad(planar, ((0, 0), (0, 0), (0, 14), (0, 70)))

    def per_img(img, x, y):
        return lax.dynamic_slice(
            img, (jnp.int32(0), y, x), (3, SW_H, SW_W))

    sw = jax.vmap(per_img)(pl_pad, mx, my)
    return max_val, mx, my, sw


@jax.jit
def fused(pa, pk):
    return frontend_pallas(pk, pa.template_u8, jnp.float32(tmean))


mv_r, mx_r, my_r, sw_r = reference(pa, crops_d)
mv_f, mx_f, my_f, sw_f = fused(pa, packed)

print("max_val equal:", np.array_equal(np.asarray(mv_r), np.asarray(mv_f)),
      " loc equal:",
      np.array_equal(np.asarray(mx_r), np.asarray(mx_f)),
      np.array_equal(np.asarray(my_r), np.asarray(my_f)))
# compare superwindow pixels (reference is planar u8; fused is packed)
swf = np.asarray(sw_f)
swr = np.asarray(sw_r)
b_eq = np.array_equal(swr[:, 0], (swf & 255).astype(np.uint8))
g_eq = np.array_equal(swr[:, 1], ((swf >> 8) & 255).astype(np.uint8))
r_eq = np.array_equal(swr[:, 2], ((swf >> 16) & 255).astype(np.uint8))
print("superwindow planes equal:", b_eq, g_eq, r_eq)
assert b_eq and g_eq and r_eq


def timed(name, fn, *args):
    @jax.jit
    def rep(*a):
        def step(i):
            out = fn(a[0], a[1] + i)
            return (out[0].sum() + out[1].sum().astype(jnp.float32)
                    + out[3].astype(jnp.float32).sum() * jnp.float32(1e-9))
        return lax.map(step, jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(*args))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(*args))
        ts.append(time.time() - t0)
    print(f"{name:12s} {min(ts)*1e3/REPS:7.2f} ms/rep")


timed("reference", lambda p, c: reference.__wrapped__(p, c.astype(jnp.uint8)),
      pa, crops_d.astype(jnp.int32))
timed("fused", lambda p, k: fused.__wrapped__(p, k), pa, packed)
