"""What dominates inside the fused stats kernel: the in-kernel contrib
(marching-squares cell pass on [GW, N]) or the per-window one-hot +
matmul loop?  Times kernel VARIANTS on a staged corpus okf (okey3,
dequad layout), REPS inside one dispatch, body xors the input with the
loop index so nothing hoists.

Variants (timing-only; checksums differ by design except `full`):
  full      shipping _stats_fused_kernel
  nocontrib contrib pass replaced by pay = boundary bit (keeps the
            one-hot builds + both matmuls per window)
  contrib   contrib pass only, histogram loop dropped (max-reduce out)
  noloop    contrib pass + has_any only (isolates the window loop incl.
            one-hots + matmuls by subtraction: full - noloop)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
REPS = 64
W = DIAL_WIN
N = W * W
GW = pallas_stats.GW
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


@jax.jit
def okey_flat(pa, pk):
    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    _, _, _, sw = frontend_pallas(
        pk, pa.template_u8, tmean, crop_hw=(250, 250))
    disk_quad = jnp.concatenate(
        [pa.mask_full[i].astype(jnp.int32) for i in range(D)], axis=1)
    bits = window_bits_quads(sw, disk_quad, pa.color_range,
                             pa.hue_shift, origins, centers)
    okey_q, _ = propagate_quads(bits, pack_closed=True)
    return (okey_q.reshape(B, W, D, W).transpose(0, 2, 1, 3)
            .reshape(B * D, N).astype(jnp.int32))


okf = jax.device_put(np.asarray(okey_flat(pa, packed)))
K = okf.shape[0]


def _contrib(ok_all):
    i32 = jnp.int32
    own_all = ok_all >> 3
    lane_j = lax.broadcasted_iota(i32, ok_all.shape, 1)
    r = lane_j >> 6
    c = lane_j & i32(63)
    o00 = own_all
    o01 = pltpu.roll(own_all, N - 1, 1)
    o10 = pltpu.roll(own_all, N - 64, 1)
    o11 = pltpu.roll(own_all, N - 65, 1)
    m = jnp.minimum(jnp.minimum(o00, o01), jnp.minimum(o10, o11))
    e00 = (o00 == m).astype(i32)
    e01 = (o01 == m).astype(i32)
    e10 = (o10 == m).astype(i32)
    e11 = (o11 == m).astype(i32)
    k = e00 + e01 + e10 + e11
    vcell = ((r < i32(63)) & (c < i32(63)) & (m < i32(N))).astype(i32)
    cls = vcell * jnp.where(k == 4, i32(2),
                            jnp.where(k == 3, i32(1), i32(0)))
    a01 = e01 * (1 - e00)
    a10 = e10 * (1 - e00) * (1 - e01)
    a11 = e11 * (1 - e00) * (1 - e01) * (1 - e10)
    return (cls * e00
            + pltpu.roll(cls * a01, 1, 1)
            + pltpu.roll(cls * a10, 64, 1)
            + pltpu.roll(cls * a11, 65, 1))


def _loop(ok_all, contrib_all, out_ref, use_contrib=True):
    i32 = jnp.int32
    i8 = jnp.int8
    sub64 = lax.broadcasted_iota(i32, (64, N), 0)
    zeros = jnp.zeros((64, N), i32)
    cell = (lax.broadcasted_iota(i32, (64, 64), 0) * i32(64)
            + lax.broadcasted_iota(i32, (64, 64), 1))
    il = lax.broadcasted_iota(i32, (1, 128), 1)

    def dot_nt(x, y):
        return lax.dot_general(
            x, y, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=i32)

    for w in range(GW):
        ok = ok_all[w:w + 1, :]
        owner = ok >> 3
        hi = (owner >> 6) + zeros
        lo = (owner & i32(63)) + zeros
        bbit = (ok & i32(1)) + zeros
        pc = (contrib_all[w:w + 1, :] + zeros if use_contrib
              else bbit)
        a = (hi == sub64).astype(i8)
        onelo = lo == sub64
        mb = (onelo & (bbit > 0)).astype(i8)
        pay = jnp.where(onelo, pc & i32(3), i32(0)).astype(i8)
        hb = dot_nt(a, mb)
        ha = dot_nt(a, pay)
        key = jnp.where(hb > 0, ha * i32(4096) + cell, i32(-1))
        km = jnp.max(key)
        anym = jnp.max((ok >> 1) & i32(1))
        out_ref[w:w + 1, :] = jnp.where(
            il == 0, jnp.full((1, 128), km, i32),
            jnp.full((1, 128), anym, i32))


def k_full(ok_ref, out_ref):
    ok_all = ok_ref[...]
    _loop(ok_all, _contrib(ok_all), out_ref)


def k_nocontrib(ok_ref, out_ref):
    ok_all = ok_ref[...]
    _loop(ok_all, None, out_ref, use_contrib=False)


def k_contrib(ok_ref, out_ref):
    i32 = jnp.int32
    ok_all = ok_ref[...]
    ca = _contrib(ok_all)
    il = lax.broadcasted_iota(i32, (GW, 128), 1)
    out_ref[...] = jnp.where(il == 0, jnp.max(ca) + jnp.zeros(
        (GW, 128), i32), jnp.zeros((GW, 128), i32))


def k_noloop(ok_ref, out_ref):
    i32 = jnp.int32
    ok_all = ok_ref[...]
    ca = _contrib(ok_all)
    il = lax.broadcasted_iota(i32, (GW, 128), 1)
    anym = jnp.max((ok_all >> 1) & i32(1)) + jnp.max(ca)
    out_ref[...] = jnp.where(il == 0, anym + jnp.zeros(
        (GW, 128), i32), jnp.zeros((GW, 128), i32))


ROW_SPANS = []
for _d in range(D):
    _ys = np.nonzero(pa.mask_full[_d])[0]
    _y0 = max(0, int(_ys.min()) - 1)
    _y1 = min(64, int(_ys.max()) + 2)
    _y0 -= _y0 % 2
    _y1 += _y1 % 2
    ROW_SPANS.append((_y0, _y1 - _y0))
print(f"row spans: {ROW_SPANS}", flush=True)


def _loop_bbox(ok_all, contrib_all, out_ref):
    """Candidate: restrict the one-hot contraction to the dial disk's
    static row bbox (+1 pad, even-aligned). All support pixels (owner
    < N) lie inside the disk mask, so pixels outside the span have the
    hi=64 sentinel and contribute nothing — dropping them from both
    the lane (pixel) axis and the hi-bin axis is bit-exact and cuts
    the broadcast/compare traffic and both matmul dims to ~52%."""
    i32 = jnp.int32
    i8 = jnp.int8
    il = lax.broadcasted_iota(i32, (1, 128), 1)

    def dot_nt(x, y):
        return lax.dot_general(
            x, y, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=i32)

    for w in range(GW):
        y0, rows = ROW_SPANS[w % D]
        ln = rows * 64
        sl = slice(y0 * 64, y0 * 64 + ln)
        sub_h = (lax.broadcasted_iota(i32, (rows, ln), 0) + i32(y0))
        sub_l = lax.broadcasted_iota(i32, (64, ln), 0)
        zh = jnp.zeros((rows, ln), i32)
        zl = jnp.zeros((64, ln), i32)
        cell = ((lax.broadcasted_iota(i32, (rows, 64), 0) + i32(y0))
                * i32(64)
                + lax.broadcasted_iota(i32, (rows, 64), 1))
        ok = ok_all[w:w + 1, sl]
        owner = ok >> 3
        hi = (owner >> 6) + zh
        lo = (owner & i32(63)) + zl
        bbit = (ok & i32(1)) + zl
        pc = contrib_all[w:w + 1, sl] + zl
        a = (hi == sub_h).astype(i8)               # [rows, ln]
        onelo = lo == sub_l
        mb = (onelo & (bbit > 0)).astype(i8)       # [64, ln]
        pay = jnp.where(onelo, pc & i32(3), i32(0)).astype(i8)
        hb = dot_nt(a, mb)                          # [rows, 64]
        ha = dot_nt(a, pay)
        key = jnp.where(hb > 0, ha * i32(4096) + cell, i32(-1))
        km = jnp.max(key)
        anym = jnp.max((ok_all[w:w + 1, :] >> 1) & i32(1))
        out_ref[w:w + 1, :] = jnp.where(
            il == 0, jnp.full((1, 128), km, i32),
            jnp.full((1, 128), anym, i32))


def k_bbox(ok_ref, out_ref):
    ok_all = ok_ref[...]
    _loop_bbox(ok_all, _contrib(ok_all), out_ref)


def call(kern, okf):
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, 128), jnp.int32),
            grid=(K // GW,),
            in_specs=[pl.BlockSpec((GW, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((GW, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(okf)


kerns = dict(full=k_full, nocontrib=k_nocontrib, contrib=k_contrib,
             noloop=k_noloop, bbox=k_bbox)
ref_full = call(k_full, okf)
got = pallas_stats.stats_select_fused(okf)
ok_par = bool(jnp.all(ref_full[:, 0] == got[0]))
print(f"local full == shipping kernel: {ok_par}", flush=True)
ref_bf = call(k_bbox, okf)
ok_bf = bool(jnp.all(ref_full == ref_bf))
print(f"bbox variant bit-identical:    {ok_bf}", flush=True)
if not ok_bf:
    bad = int(jnp.argmax(jnp.any(ref_full != ref_bf, axis=1)))
    print(f"  first mismatch window {bad}: "
          f"{ref_full[bad, :2]} vs {ref_bf[bad, :2]}")

for name, kern in list(kerns.items()) + [("full", k_full)]:
    @jax.jit
    def rep(okf, kern=kern):
        return lax.map(
            lambda i: call(kern, okf ^ i).sum(),
            jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = int(rep(okf))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = int(rep(okf))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS * 1e3
    print(f"{name:10s} {per:8.3f} ms/1024w   [{r}]", flush=True)
