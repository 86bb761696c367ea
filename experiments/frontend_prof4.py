"""Cost split of the CURRENT geometry-parametric frontend kernel
(round-3 pallas_frontend). Variants disable pieces of the correlation
epilogue to expose where the non-matmul time goes:

  base       : shipping kernel body
  nosum      : diagonal sublane-sum -> take row 0      (WRONG results)
  noroll     : strided rotate skipped                  (WRONG results)
  norollsum  : both skipped                            (WRONG results)
  nomm       : correlation matmul -> broadcast         (WRONG results)
  selmm      : rolls kept, per-column sublane-sums replaced by ONE
               [32, 32*blk] selector matmul per group  (EXACT — A/B'd)

Timing amortized REPS inside one dispatch (xor the input with the loop
index so XLA cannot hoist)."""
import functools
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
from meterelf_tpu.params import Params
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.ops import pallas_frontend as fe

B, REPS = 256, 16
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, _ = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
packed_np = jio.pack_crops(np.tile(crops_np, (reps_t, 1, 1, 1))[:B],
                           pad_hw=(fe.STAGE, fe.STAGE))
packed = jax.device_put(packed_np)
th, tw = pa.template_zm.shape
geom = fe.geom_for(params.meter_rect.height, params.meter_rect.width,
                   th, tw)
tmean = float(np.sum(pa.template_u8.astype(np.int64))) / (th * tw)


def core_variant(img_ref, bank_ref, c1_ref, corr_ref, geom, mode):
    i32, f32 = jnp.int32, jnp.float32
    g = geom
    STAGE, H_PAD, W_PAD = fe.STAGE, fe.H_PAD, fe.W_PAD
    v256 = img_ref[...]
    v = jnp.concatenate(
        [jnp.concatenate(
            [v256, jnp.zeros((H_PAD - STAGE, STAGE), jnp.int32)], axis=0),
         jnp.zeros((H_PAD, W_PAD - STAGE), jnp.int32)], axis=1)
    b_pl = (v256 & i32(255)).astype(f32)
    g_pl = ((v256 >> 8) & i32(255)).astype(f32)
    r_pl = ((v256 >> 16) & i32(255)).astype(f32)
    scale = f32(1.0) / f32(255.0)
    bs, gs, rs = b_pl * scale, g_pl * scale, r_pl * scale
    vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
    vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
    l256 = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                    f32(0.0), f32(255.0))
    l8 = (l256.astype(i32) - i32(128)).astype(jnp.int8)
    lt8 = jnp.concatenate(
        [jnp.transpose(l8), jnp.zeros((64, STAGE), jnp.int8)], axis=0)
    bank = bank_ref[...]

    for x32 in range(0, g.nx * 32, 32):
        sl = lt8[x32:x32 + g.bank_k, :]
        if mode == "nomm":
            rx = jnp.broadcast_to(sl[0:1, :].astype(i32),
                                  (32 * g.blk, STAGE)) + i32(0)
        else:
            rx = lax.dot_general(
                bank, sl, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=i32)
        if mode == "segsum":
            # roll each block, stack, then ONE masked log-shift
            # segmented sublane-reduce over all 32 blocks (exact)
            rows = []
            for d in range(32):
                blk = rx[d * g.blk:(d + 1) * g.blk, :]
                rows.append(pltpu.roll(blk, 0, 1, stride=1,
                                       stride_axis=0))
            rstack = jnp.concatenate(rows, axis=0)  # [32*blk, STAGE]
            i32_ = jnp.int32
            sub = lax.broadcasted_iota(i32_, (32 * g.blk, fe.STAGE), 0)
            off = sub % i32_(g.blk)   # position within the segment
            b = 1
            while b < g.th:
                shifted = pltpu.roll(rstack, (32 * g.blk) - b, 0)
                ok2 = (off + i32_(b) < i32_(g.th))
                rstack = jnp.where(ok2, rstack + shifted, rstack)
                b *= 2
            for d in range(min(32, g.ow - x32)):
                corr_ref[x32 + d, :] = rstack[d * g.blk, :]
            continue
        if mode == "selmm":
            rows = []
            for d in range(32):
                blk = rx[d * g.blk:(d + 1) * g.blk, :]
                rows.append(pltpu.roll(blk, 0, 1, stride=1,
                                       stride_axis=0))
            rstack = jnp.concatenate(rows, axis=0)  # [32*blk, STAGE]
            sub = lax.broadcasted_iota(i32, (32, 32 * g.blk), 0)
            lane = lax.broadcasted_iota(i32, (32, 32 * g.blk), 1)
            sel_ok = ((lane >= sub * g.blk)
                      & (lane < sub * g.blk + i32(g.th)))
            sel = sel_ok.astype(jnp.int8)
            # corr rows for these 32 columns in one [32, 32*blk] matmul
            csum = lax.dot_general(
                sel, rstack.astype(jnp.int8) * 0 + rstack.astype(i32)
                if False else rstack,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=i32)         # [32, STAGE]
            for d in range(min(32, g.ow - x32)):
                corr_ref[x32 + d, :] = csum[d, :]
            continue
        for d in range(min(32, g.ow - x32)):
            blk = rx[d * g.blk:(d + 1) * g.blk, :]
            if mode in ("noroll", "norollsum"):
                rr = blk
            else:
                rr = pltpu.roll(blk, 0, 1, stride=1, stride_axis=0)
            if mode in ("nosum", "norollsum"):
                corr_ref[x32 + d, :] = rr[0, :]
            else:
                corr_ref[x32 + d, :] = jnp.sum(rr, axis=0)
    corrT_raw = corr_ref[...][0:g.ow, :]
    corrT = pltpu.roll(corrT_raw, STAGE - (g.th - 1), 1).astype(f32)

    ob_r = lax.broadcasted_iota(i32, (g.ow_pad, STAGE + 64), 0)
    ob_c = lax.broadcasted_iota(i32, (g.ow_pad, STAGE + 64), 1)
    obank = ((ob_c >= ob_r) & (ob_c < ob_r + i32(g.tw))).astype(jnp.int8)
    rt = lax.dot_general(
        obank, lt8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=i32)
    cs = fe._prefix_sum(rt, 1)
    top = pltpu.roll(cs, STAGE - (g.th - 1), 1)
    bot = pltpu.roll(cs, 1, 1)
    ylp = lax.broadcasted_iota(i32, (g.ow_pad, STAGE), 1)
    boxT = (top - jnp.where(ylp >= 1, bot, i32(0)))[0:g.ow, :]
    scoresT = corrT + c1_ref[0] * boxT.astype(f32) + c1_ref[1]

    xr = lax.broadcasted_iota(i32, (g.ow, STAGE), 0)
    yl = lax.broadcasted_iota(i32, (g.ow, STAGE), 1)
    in_range = yl < i32(g.oh)
    neg = f32(-3.0e38)
    smask = jnp.where(in_range, scoresT, neg)
    max_val = jnp.max(smask)
    flat = yl * i32(g.ow) + xr
    cand = jnp.where(smask == max_val, flat, i32(g.oh * g.ow))
    sel2 = jnp.min(cand)
    my = sel2 // i32(g.ow)
    mx = sel2 % i32(g.ow)
    rot = pltpu.roll(v, i32(H_PAD) - my, 0)
    rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)
    return max_val, mx, my, rot[0:fe.SW_H, 0:fe.SW_W]


def kernel_variant(img_ref, bank_ref, c1_ref, sw_ref, stat_ref, corr_ref,
                   *, geom, mode):
    max_val, mx, my, sw = core_variant(img_ref, bank_ref, c1_ref,
                                       corr_ref, geom, mode)
    sw_ref[...] = sw
    stat_ref[...] = fe._stat_tile(max_val, mx, my)


def run_variant(mode, pk):
    img_pad = pk.reshape(B * fe.STAGE, fe.STAGE)
    c1 = fe._c1_for(jnp.asarray(pa.template_u8), tmean)
    with jax.enable_x64(False):
        bank = fe._template_bank(jnp.asarray(pa.template_u8), geom)
        sw, stat = pl.pallas_call(
            functools.partial(kernel_variant, geom=geom, mode=mode),
            out_shape=(
                jax.ShapeDtypeStruct((B * fe.SW_H, fe.SW_W), jnp.int32),
                jax.ShapeDtypeStruct((B * 8, 128), jnp.float32),
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((fe.STAGE, fe.STAGE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((32 * geom.blk, geom.bank_k),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((fe.SW_H, fe.SW_W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((geom.nx * 32, fe.STAGE),
                                       jnp.int32)],
        )(img_pad, bank, c1)
    return sw.reshape(B, fe.SW_H, fe.SW_W), stat.reshape(B, 8, 128)


# selmm removed: tpu.matmul rejects the i8 x i32 selector contraction
# (rowcorr values exceed i8/bf16 exact range, so an MXU sum-matmul
# cannot be integer-exact here)
# exactness A/B for segsum before timing
sw0, st0 = jax.jit(lambda p: run_variant("base", p))(packed)
sw1, st1 = jax.jit(lambda p: run_variant("segsum", p))(packed)
print("segsum exact:", bool((np.asarray(sw0) == np.asarray(sw1)).all()),
      bool((np.asarray(st0) == np.asarray(st1)).all()))
for mode in ("base", "segsum", "nosum", "noroll", "norollsum", "nomm"):
    @jax.jit
    def rep(pk, mode=mode):
        def body(i):
            pkx = pk.at[:, 0, 0].set(pk[:, 0, 0] ^ i)
            sw, stat = run_variant(mode, pkx)
            return stat.sum() + sw.sum().astype(jnp.float32)
        return lax.map(body, jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(packed))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(packed))
        ts.append(time.perf_counter() - t0)
    print(f"{mode:10s} {min(ts)/REPS*1e3:7.2f} ms/batch")
