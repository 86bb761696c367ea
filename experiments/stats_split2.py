"""How much of the fused-stats stage is the dequad relayout vs the
kernel itself?  Three variants of the okey_q -> stats_select_fused
feed, timed as FULL prefixes (frontend..stats) so the common prefix
cancels in the deltas:

  v0 dequad   (0,2,1,3) y-major flat rows — the shipping path
  v1 xmajor   (0,2,3,1) x-major flat rows — BIT-IDENTICAL results:
              the histogram is pixel-order-invariant and the in-kernel
              contrib cell algebra is corner-symmetric (see
              ops/pallas_stats.py _stats_fused_kernel; the receiver
              priority changes but exactly one corner with owner == m
              receives each cell either way, so per-owner sums match)
  v2 nolayout okey_q.reshape(B*D, N) — WRONG window grouping, timing
              only: the kernel's compute is shape/control identical,
              so v0 - v2 isolates the relayout's cost.

Bit-equality of v0 vs v1 is asserted eagerly on corpus bits first.
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
from meterelf_tpu.ops import pallas_stats
from meterelf_tpu.ops.pallas_frontend import frontend_pallas, STAGE
from meterelf_tpu.ops.pallas_windows import window_bits_quads
from meterelf_tpu.ops.pallas_ccl import propagate_quads

B = 256
REPS = 16
W = DIAL_WIN
N = W * W
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


def okey_quad(pa, pk):
    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    max_val, mx, my, sw = frontend_pallas(
        pk, pa.template_u8, tmean, crop_hw=(250, 250))
    disk_quad = jnp.concatenate(
        [pa.mask_full[i].astype(jnp.int32) for i in range(D)], axis=1)
    bits = window_bits_quads(sw, disk_quad, pa.color_range,
                             pa.hue_shift, origins, centers)
    okey_q, conv_q = propagate_quads(bits, pack_closed=True)
    return okey_q, max_val


def feed(okey_q, variant):
    if variant == "dequad":
        return (okey_q.reshape(B, W, D, W).transpose(0, 2, 1, 3)
                .reshape(B * D, N))
    if variant == "xmajor":
        return (okey_q.reshape(B, W, D, W).transpose(0, 2, 3, 1)
                .reshape(B * D, N))
    if variant == "nolayout":
        return okey_q.reshape(B * D, N)
    raise ValueError(variant)


def run(pa, pk, variant):
    okey_q, max_val = okey_quad(pa, pk)
    keymax, hasany = pallas_stats.stats_select_fused(feed(okey_q, variant))
    return (keymax.sum().astype(jnp.float32)
            + hasany.sum().astype(jnp.float32) + max_val.sum())


# --- bit-equality gate: dequad vs xmajor on corpus bits, eager ---
okq, _ = jax.jit(okey_quad)(pa, packed)
k0, h0 = pallas_stats.stats_select_fused(feed(okq, "dequad"))
k1, h1 = pallas_stats.stats_select_fused(feed(okq, "xmajor"))
same = bool(jnp.all(k0 == k1)) and bool(jnp.all(h0 == h1))
print(f"xmajor bit-identical to dequad: {same}", flush=True)
if not same:
    bad = int(jnp.argmax(k0 != k1))
    print(f"  first mismatch window {bad}: {int(k0[bad])} vs "
          f"{int(k1[bad])}")

for variant in ("dequad", "xmajor", "nolayout", "dequad"):
    @jax.jit
    def rep(pa, pk, variant=variant):
        return lax.map(
            lambda i: run(pa, pk ^ i, variant),
            jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(pa, packed))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(pa, packed))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS * 1e3
    print(f"{variant:10s} {per:8.3f} ms/batch   [{r:.6e}]", flush=True)
