"""Parity + timing of the fused Pallas CCL kernel vs the XLA path.

Parity on real corpus-derived window masks (all 81+223 images x 4
dials) and on adversarial synthetic noise; timing amortized in one
dispatch."""
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
from meterelf_tpu.ops.pallas_match import match_scores_pallas
from meterelf_tpu.pipeline.decode import _dial_masks_from_packed_window

W = DIAL_WIN


def corpus_masks(sdir):
    params = Params.load(f"{sdir}/params.yml")
    pa = params.arrays()
    files = sorted(glob(f"{sdir}/*.jpg"))
    crops, ok = jio.load_crops(files, params.meter_rect)
    B = crops.shape[0]
    D = pa.mask_full.shape[0]
    th, tw = pa.template_zm.shape

    @jax.jit
    def masks(pa, c_u8):
        planar = jnp.transpose(c_u8, (0, 3, 1, 2))
        lightness = color_ops.lightness_from_planes(
            planar[:, 0], planar[:, 1], planar[:, 2]).astype(jnp.float32)
        tmean = (jnp.sum(pa.template_u8.astype(jnp.int32)).astype(jnp.float32)
                 / jnp.float32(th * tw))
        scores = template_ops.match_template_scores_matmul(
            lightness, pa.template_u8, tmean)
        _, mx, my = template_ops.locate(scores)
        packed = (c_u8[..., 0].astype(jnp.int32)
                  | (c_u8[..., 1].astype(jnp.int32) << 8)
                  | (c_u8[..., 2].astype(jnp.int32) << 16))

        def window(img_pk, x, y, i):
            return jax.lax.dynamic_slice(
                img_pk, (y + pa.win_origin[i][1], x + pa.win_origin[i][0]),
                (W, W))

        m, c = jax.vmap(lambda img, x, y: jax.vmap(
            lambda i: _dial_masks_from_packed_window(
                window(img, x, y, i), pa.color_range[i], pa.centers_int[i],
                pa.mask_full[i], pa.hue_shift))
            (jnp.arange(D)))(packed, mx, my)
        return m, c

    m, c = masks(pa, crops)
    disk = np.broadcast_to(pa.mask_full[None], (B, D, W, W))
    return (np.asarray(m).reshape(-1, W, W),
            np.asarray(c).reshape(-1, W, W),
            disk.reshape(-1, W, W).copy())


ms, cs, ds = [], [], []
for sdir in ("/root/reference/sample-images1", "/root/reference/sample-images2"):
    m, c, d = corpus_masks(sdir)
    ms.append(m), cs.append(c), ds.append(d)
# adversarial: random noise blobs (stress propagation convergence + seams)
rng = np.random.default_rng(1)
yy, xx = np.mgrid[:W, :W]
for p in (0.15, 0.35, 0.55):
    dk = ((yy - 32) ** 2 + (xx - 32) ** 2) <= 23 ** 2
    cl = rng.random((256, W, W)) < p
    ms.append(cl & dk[None]), cs.append(cl)
    ds.append(np.broadcast_to(dk, (256, W, W)).copy())

masked = np.concatenate(ms)
closed = np.concatenate(cs)
disk = np.concatenate(ds)
print("windows:", masked.shape[0])

mj, cj, dj = map(jax.device_put, (masked, closed, disk))
r_x = jax.jit(lambda a, b, c: comp_ops.analyze_batch(a, b, c, impl="xla"))(
    mj, cj, dj)
r_p = jax.jit(lambda a, b, c: comp_ops.analyze_batch(a, b, c, impl="pallas"))(
    mj, cj, dj)

nr_eq = np.array_equal(np.asarray(r_x.needle_region),
                       np.asarray(r_p.needle_region))
ha_eq = np.array_equal(np.asarray(r_x.has_any), np.asarray(r_p.has_any))
cv_x = np.asarray(r_x.converged)
cv_p = np.asarray(r_p.converged)
print("needle_region equal:", nr_eq, " has_any equal:", ha_eq)
print("converged: xla", cv_x.sum(), "/", len(cv_x),
      " pallas", cv_p.sum(), "/", len(cv_p),
      " equal:", np.array_equal(cv_x, cv_p))
assert nr_eq and ha_eq

# timing, amortized (K=2048 like the real batch)
K = 2048
reps = -(-K // masked.shape[0])
mt = jax.device_put(np.tile(masked, (reps, 1, 1))[:K])
ct = jax.device_put(np.tile(closed, (reps, 1, 1))[:K])
dt_ = jax.device_put(np.tile(disk, (reps, 1, 1))[:K])
REPS = 16
for impl in ("xla", "pallas"):
    @jax.jit
    def rep(m, c, d, impl=impl):
        return lax.map(
            lambda i: comp_ops.analyze_batch(
                m ^ (i % 2 == 1), c, d, impl=impl).needle_region.sum(),
            jnp.arange(REPS)).sum()

    r = float(rep(mt, ct, dt_))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(mt, ct, dt_))
        ts.append(time.time() - t0)
    print(f"analyze_batch[{impl:6s}] {min(ts)*1e3/REPS:7.2f} ms/rep")
