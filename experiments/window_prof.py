"""Sub-stage decomposition of the window stage (slice + HLS + inRange +
close3): which part of its ~5 ms matters? Amortized one-dispatch."""
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
from meterelf_tpu.ops import morphology as morph_ops

B = 512
REPS = 16
W = DIAL_WIN
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps = -(-B // crops_np.shape[0])
crops = jax.device_put(
    np.ascontiguousarray(
        np.tile(crops_np, (reps, 1, 1, 1))[:B].transpose(0, 3, 1, 2)))
D = pa.mask_full.shape[0]
rng = np.random.default_rng(0)
mx = jax.device_put(rng.integers(5, 55, B).astype(np.int32))
my = jax.device_put(rng.integers(5, 120, B).astype(np.int32))


def stage(upto, pa, planar, mx, my):
    def per_dial(img, x, y, i):
        origin = (jnp.int32(0),
                  y + pa.win_origin[i][1], x + pa.win_origin[i][0])
        win = lax.dynamic_slice(img, origin, (3, W, W))
        if upto == 0:
            return win.astype(jnp.int32).sum()
        h, l, s = color_ops.bgr_planes_to_hls(
            win[0], win[1], win[2], pa.hue_shift)
        hls_pl = jnp.stack([h, l, s])
        if upto == 1:
            return hls_pl.sum()
        core = lax.dynamic_slice(
            hls_pl, (jnp.int32(0), pa.centers_int[i][1] - 2,
                     pa.centers_int[i][0] - 2), (3, 5, 5))
        ssum = jnp.sum(core, axis=(1, 2))
        dial_color = (2 * ssum + 25) // 50
        lo = jnp.clip(dial_color - pa.color_range[i], 0, 255)
        hi = jnp.clip(dial_color + pa.color_range[i], 0, 255)
        raw = jnp.all((hls_pl >= lo[:, None, None])
                      & (hls_pl <= hi[:, None, None]), axis=0)
        if upto == 2:
            return raw.sum().astype(jnp.int32)
        closed = morph_ops.close3(raw)
        return closed.sum().astype(jnp.int32)

    out = jax.vmap(lambda img, x, y: jax.vmap(
        lambda i: per_dial(img, x, y, i))(jnp.arange(D)))(planar, mx, my)
    return out.sum()


names = ["slice", "+hls", "+inrange", "+close3"]
prev = 0.0
for upto, name in enumerate(names):
    @jax.jit
    def rep(pa, c, x, y):
        return lax.map(lambda i: stage(upto, pa, c + i.astype(jnp.uint8),
                                       x, y),
                       jnp.arange(REPS, dtype=jnp.uint8)).sum()

    r = float(rep(pa, crops, mx, my))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(pa, crops, mx, my))
        ts.append(time.time() - t0)
    per = min(ts) * 1e3 / REPS
    print(f"{name:10s} cum {per:7.2f} ms   delta {per - prev:7.2f} ms")
    prev = per


# ---- alternatives for the dynamic-slice gather ----
# (1) ONE superwindow slice per image at (my, mx), then static windows
crops_pad = jnp.pad(crops, ((0, 0), (0, 0), (0, 14), (0, 70)))  # 264, 320
WOx = [int(v) for v in pa.win_origin[:, 0]]
WOy = [int(v) for v in pa.win_origin[:, 1]]


def super_slice(pa, planar_pad, mx, my):
    def per_img(img, x, y):
        sw = lax.dynamic_slice(img, (jnp.int32(0), y, x), (3, 136, 256))
        tot = jnp.int32(0)
        for d in range(D):
            win = sw[:, WOy[d]:WOy[d] + W, WOx[d]:WOx[d] + W]
            tot += win.astype(jnp.int32).sum()
        return tot
    return jax.vmap(per_img)(planar_pad, mx, my).sum()


# (2) double one-hot matmul: rows and cols selected on the MXU
def onehot_mm(pa, planar_pad, mx, my):
    # planar_pad [B, 3, 264, 320] u8
    rows_i = lax.broadcasted_iota(jnp.int32, (264, 136), 0)
    rows_j = lax.broadcasted_iota(jnp.int32, (264, 136), 1)
    cols_i = lax.broadcasted_iota(jnp.int32, (320, 256), 0)
    cols_j = lax.broadcasted_iota(jnp.int32, (320, 256), 1)

    def per_img(img, x, y):
        pr = (rows_i == rows_j + y).astype(jnp.bfloat16)     # [264, 136]
        pc = (cols_i == cols_j + x).astype(jnp.bfloat16)     # [320, 256]
        a = img.astype(jnp.bfloat16)                          # [3, 264, 320]
        m1 = jnp.einsum("crw,rh->chw", a, pr)                 # [3, 136, 320]
        m2 = jnp.einsum("chw,wv->chv", m1, pc)                # [3, 136, 256]
        sw = m2.astype(jnp.int32)
        tot = jnp.int32(0)
        for d in range(D):
            win = sw[:, WOy[d]:WOy[d] + W, WOx[d]:WOx[d] + W]
            tot += win.sum()
        return tot
    return jax.vmap(per_img)(planar_pad, mx, my).sum()


for name, fn in (("superslice", super_slice), ("onehot_mm", onehot_mm)):
    @jax.jit
    def rep(pa, c, x, y, fn=fn):
        return lax.map(lambda i: fn(pa, c + i.astype(jnp.uint8), x, y),
                       jnp.arange(REPS, dtype=jnp.uint8)).sum()

    r = float(rep(pa, crops_pad, mx, my))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(pa, crops_pad, mx, my))
        ts.append(time.time() - t0)
    print(f"{name:10s} {min(ts)*1e3/REPS:7.2f} ms  (r={r})")
