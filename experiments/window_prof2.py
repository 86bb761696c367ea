"""Current (superwindow static-slice) window-stage profile: is the
emulated-f64 exact division the cost? Amortized one-dispatch."""
import sys
import time
from unittest import mock

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
from meterelf_tpu.pipeline import decode as dec

B = 512
REPS = 16
W = DIAL_WIN
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
D = pa.mask_full.shape[0]
SW_H, SW_W = 136, 256
rng = np.random.default_rng(0)
# fake superwindows straight from the crops (content doesn't matter
# for timing; use real pixel stats)
c = np.tile(crops_np, (reps_t, 1, 1, 1))[:B]
c32 = c.astype(np.int32)
pk = c32[..., 0] | (c32[..., 1] << 8) | (c32[..., 2] << 16)
sw_np = np.ascontiguousarray(pk[:, :SW_H, :SW_W])
sw = jax.device_put(sw_np)
win_origin_static = tuple((int(x), int(y)) for x, y in np.asarray(pa.win_origin))
# clamp origins into the superwindow for the fake layout
wos = [(min(ox, SW_W - W), min(oy, SW_H - W)) for ox, oy in win_origin_static]


def windows(sw, fastdiv):
    ctx = (mock.patch.object(color_ops, "_exact_f32_div",
                             lambda n, d: n / d)
           if fastdiv else mock.patch.object(color_ops, "_exact_f32_div",
                                             color_ops._exact_f32_div))
    with ctx:
        tot = jnp.int32(0)
        for i in range(D):
            ox, oy = wos[i]
            win_pk = sw[:, oy:oy + W, ox:ox + W]
            m, cl = jax.vmap(
                lambda wp, i=i: dec._dial_masks_from_packed_window(
                    wp, pa.color_range[i], pa.centers_int[i],
                    pa.mask_full[i], pa.hue_shift))(win_pk)
            tot += m.sum().astype(jnp.int32) + cl.sum().astype(jnp.int32)
        return tot


for name, fast in (("exact-div", False), ("tpu-div", True)):
    @jax.jit
    def rep(sw, fast=fast):
        return lax.map(lambda i: windows(sw ^ i, fast),
                       jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(sw))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(sw))
        ts.append(time.perf_counter() - t0)
    print(f"{name:10s} {min(ts) / REPS * 1e3:7.2f} ms/batch  [{r}]")
