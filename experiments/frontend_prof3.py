"""SUPERSEDED by frontend_prof4.py: this harness predates the round-3
geometry generalization (it reads R_PAD/K_PAD constants that became
FrontendGeom fields) and no longer runs. Kept for the historical
record of the strided-rotate decision it measured.

Frontend kernel cost split + strided-rotate diagonal reduction.

Variants:
  base    : current _frontend_kernel
  nodiag  : diagonal reduction replaced by plain lane sum (WRONG result,
            isolates the roll cost)
  strided : 7-step masked log-roll -> ONE pltpu.roll(stride=1 per lane)
  nomm    : matmul replaced by a cheap broadcast (isolates matmul cost)

Correctness of `strided` is checked against `base` on real corpus crops.
"""
import sys
import time

raise SystemExit(
    "frontend_prof3.py is superseded by frontend_prof4.py (the kernel "
    "became geometry-parametric in round 3); run that instead")

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

B = 512
REPS = 16
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, ok_np = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
packed_np = jio.pack_crops(
    np.tile(crops_np, (reps_t, 1, 1, 1))[:B], pad_hw=(fe.H_PAD, fe.W_PAD))
packed = jax.device_put(packed_np)
th, tw = pa.template_zm.shape
tsum = int(pa.template_u8.astype(np.int64).sum())
tmean = np.float32(tsum / (th * tw))

i32 = jnp.int32
f32 = jnp.float32
H_PAD, W_PAD = fe.H_PAD, fe.W_PAD
R_PAD, K_PAD = fe.R_PAD, fe.K_PAD
OH, OW, TH, TW = fe.OH, fe.OW, fe.TH, fe.TW
OH_PAD, SW_H, SW_W = fe.OH_PAD, fe.SW_H, fe.SW_W


def make_kernel_t():
    """Fully transposed scorer: one matmul + ONE strided lane-rotate per
    column (base shift 0 keeps the per-vreg spread at 127 <= 128; the
    TH-1 output offset is fixed once, post-concat). t_ref must hold the
    ROW-REVERSED template."""
    def kernel(img_ref, t_ref, tmean_ref, sw_ref, stat_ref):
        v = img_ref[...]
        b = (v & i32(255)).astype(f32)
        g = ((v >> 8) & i32(255)).astype(f32)
        r = ((v >> 16) & i32(255)).astype(f32)
        scale = f32(1.0) / f32(255.0)
        bs, gs, rs = b * scale, g * scale, r * scale
        vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
        vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
        limg = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                        f32(0.0), f32(255.0))
        l256 = limg[0:256, 0:256]
        ltf = jnp.transpose(l256)                   # [col, row] f32
        lt_bf16 = ltf.astype(jnp.bfloat16)
        t_bf16 = t_ref[...].astype(jnp.bfloat16)    # row-reversed

        cols = []
        for x in range(OW):
            sl = lt_bf16[x:x + K_PAD, :]
            rx3 = lax.dot_general(
                t_bf16, sl,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)         # [R_PAD, 256]
            rr = pltpu.roll(rx3, 0, 1, stride=1, stride_axis=0)
            cols.append(jnp.sum(rr, axis=0, keepdims=True))
        corrT_raw = jnp.concatenate(cols, axis=0)   # [OW, 256]
        # corr[y, x] sits at lane y + TH-1: one static roll aligns it
        corrT = pltpu.roll(corrT_raw, 256 - (TH - 1), 1)

        # integral image in transposed orientation: csT = cs^T
        csT = fe._prefix_sum(fe._prefix_sum(ltf, 0), 1)
        xr = lax.broadcasted_iota(i32, (OW, 256), 0)
        top = pltpu.roll(csT, 256 - (TW - 1), 0)[0:OW, :]   # csT[x+TW-1]
        bot = pltpu.roll(csT, 1, 0)[0:OW, :]                # csT[x-1]
        dT = top - jnp.where(xr >= 1, bot, f32(0.0))
        yl = lax.broadcasted_iota(i32, (OW, 256), 1)
        a = pltpu.roll(dT, 256 - (TH - 1), 1)               # dT[., y+TH-1]
        bl = pltpu.roll(dT, 1, 1)                           # dT[., y-1]
        boxT = a - jnp.where(yl >= 1, bl, f32(0.0))
        scoresT = corrT - tmean_ref[0] * boxT               # [OW, 256]

        in_range = yl < i32(OH)
        neg = f32(-3.0e38)
        smask = jnp.where(in_range, scoresT, neg)
        max_val = jnp.max(smask)
        flat = yl * i32(OW) + xr
        cand = jnp.where(smask == max_val, flat, i32(OH_PAD * OW))
        sel = jnp.min(cand)
        my = sel // i32(OW)
        mx = sel % i32(OW)

        rot = pltpu.roll(v, i32(H_PAD) - my, 0)
        rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)
        sw_ref[...] = rot[0:SW_H, 0:SW_W]

        stat = jnp.zeros((8, 128), f32)
        lane8 = lax.broadcasted_iota(i32, (8, 128), 1)
        stat = jnp.where(lane8 == 0, max_val, stat)
        stat = jnp.where(lane8 == 1, mx.astype(f32), stat)
        stat = jnp.where(lane8 == 2, my.astype(f32), stat)
        stat_ref[...] = stat
    return kernel


def make_kernel_mm8():
    """Transposed scorer with 8 output columns per matmul: t_ref holds a
    [1024, 256] bank of 8 column-shifted copies of the row-reversed
    template (block d rows = T[TH-1-s, c-d]). Each matmul is
    [1024,256]x[256,256]; block d of the result is column x8+d, finished
    by the same strided rotate + sublane sum."""
    def kernel(img_ref, t_ref, tmean_ref, sw_ref, stat_ref):
        v = img_ref[...]
        b = (v & i32(255)).astype(f32)
        g = ((v >> 8) & i32(255)).astype(f32)
        r = ((v >> 16) & i32(255)).astype(f32)
        scale = f32(1.0) / f32(255.0)
        bs, gs, rs = b * scale, g * scale, r * scale
        vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
        vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
        limg = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                        f32(0.0), f32(255.0))
        l256 = limg[0:256, 0:256]
        ltf = jnp.transpose(l256)                   # [col, row] f32
        lt320 = jnp.concatenate(
            [ltf.astype(jnp.bfloat16),
             jnp.zeros((64, 256), jnp.bfloat16)], axis=0)
        t_bf16 = t_ref[...].astype(jnp.bfloat16)    # [1024, 256] bank

        cols = []
        for x8 in range(0, 64, 8):
            sl8 = lt320[x8:x8 + 256, :]
            rx8 = lax.dot_general(
                t_bf16, sl8,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)         # [1024, 256]
            for d in range(8):
                blk = rx8[d * 128:(d + 1) * 128, :]
                rr = pltpu.roll(blk, 0, 1, stride=1, stride_axis=0)
                cols.append(jnp.sum(rr, axis=0, keepdims=True))
        corrT_raw = jnp.concatenate(cols, axis=0)[0:OW, :]
        corrT = pltpu.roll(corrT_raw, 256 - (TH - 1), 1)

        csT = fe._prefix_sum(fe._prefix_sum(ltf, 0), 1)
        xr = lax.broadcasted_iota(i32, (OW, 256), 0)
        top = pltpu.roll(csT, 256 - (TW - 1), 0)[0:OW, :]
        bot = pltpu.roll(csT, 1, 0)[0:OW, :]
        dT = top - jnp.where(xr >= 1, bot, f32(0.0))
        yl = lax.broadcasted_iota(i32, (OW, 256), 1)
        a = pltpu.roll(dT, 256 - (TH - 1), 1)
        bl = pltpu.roll(dT, 1, 1)
        boxT = a - jnp.where(yl >= 1, bl, f32(0.0))
        scoresT = corrT - tmean_ref[0] * boxT

        in_range = yl < i32(OH)
        neg = f32(-3.0e38)
        smask = jnp.where(in_range, scoresT, neg)
        max_val = jnp.max(smask)
        flat = yl * i32(OW) + xr
        cand = jnp.where(smask == max_val, flat, i32(OH_PAD * OW))
        sel = jnp.min(cand)
        my = sel // i32(OW)
        mx = sel % i32(OW)

        rot = pltpu.roll(v, i32(H_PAD) - my, 0)
        rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)
        sw_ref[...] = rot[0:SW_H, 0:SW_W]

        stat = jnp.zeros((8, 128), f32)
        lane8 = lax.broadcasted_iota(i32, (8, 128), 1)
        stat = jnp.where(lane8 == 0, max_val, stat)
        stat = jnp.where(lane8 == 1, mx.astype(f32), stat)
        stat = jnp.where(lane8 == 2, my.astype(f32), stat)
        stat_ref[...] = stat
    return kernel


def make_kernel_i8():
    """int8 MXU scorer: L-128 and T-128 as int8, 32 column-shifted
    template copies per bank -> TWO [4096,256]x[256,256] i8->i32 matmuls
    per image. corr8 is INTEGER-EXACT; the -128 cross terms fold into
    the boxsum: scores = corr8 + (128 - tmean)*box + c0."""
    def kernel(img_ref, t_ref, sc_ref, sw_ref, stat_ref):
        v = img_ref[...]
        b = (v & i32(255)).astype(f32)
        g = ((v >> 8) & i32(255)).astype(f32)
        r = ((v >> 16) & i32(255)).astype(f32)
        scale = f32(1.0) / f32(255.0)
        bs, gs, rs = b * scale, g * scale, r * scale
        vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
        vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
        limg = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                        f32(0.0), f32(255.0))
        l256 = limg[0:256, 0:256]
        ltf = jnp.transpose(l256)                   # [col, row] f32
        lt8 = jnp.concatenate(
            [(ltf.astype(i32) - i32(128)).astype(jnp.int8),
             jnp.zeros((64, 256), jnp.int8)], axis=0)   # [320, 256]
        tb = t_ref[...]                             # [4096, 256] i8 bank

        cols = []
        for x32 in range(0, 64, 32):
            sl = lt8[x32:x32 + 256, :]
            rx = lax.dot_general(
                tb, sl,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=i32)         # [4096, 256] i32
            for d in range(32):
                blk = rx[d * 128:(d + 1) * 128, :]
                rr = pltpu.roll(
                    blk, 0, 1, stride=1, stride_axis=0)
                cols.append(jnp.sum(rr, axis=0, keepdims=True))
        corrT_raw = jnp.concatenate(cols, axis=0)[0:OW, :]   # i32
        corrT = pltpu.roll(corrT_raw, 256 - (TH - 1), 1).astype(f32)

        csT = fe._prefix_sum(fe._prefix_sum(ltf, 0), 1)
        xr = lax.broadcasted_iota(i32, (OW, 256), 0)
        top = pltpu.roll(csT, 256 - (TW - 1), 0)[0:OW, :]
        bot = pltpu.roll(csT, 1, 0)[0:OW, :]
        dT = top - jnp.where(xr >= 1, bot, f32(0.0))
        yl = lax.broadcasted_iota(i32, (OW, 256), 1)
        a = pltpu.roll(dT, 256 - (TH - 1), 1)
        bl = pltpu.roll(dT, 1, 1)
        boxT = a - jnp.where(yl >= 1, bl, f32(0.0))
        scoresT = corrT + sc_ref[1] * boxT + sc_ref[2]

        in_range = yl < i32(OH)
        neg = f32(-3.0e38)
        smask = jnp.where(in_range, scoresT, neg)
        max_val = jnp.max(smask)
        flat = yl * i32(OW) + xr
        cand = jnp.where(smask == max_val, flat, i32(OH_PAD * OW))
        sel = jnp.min(cand)
        my = sel // i32(OW)
        mx = sel % i32(OW)

        rot = pltpu.roll(v, i32(H_PAD) - my, 0)
        rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)
        sw_ref[...] = rot[0:SW_H, 0:SW_W]

        stat = jnp.zeros((8, 128), f32)
        lane8 = lax.broadcasted_iota(i32, (8, 128), 1)
        stat = jnp.where(lane8 == 0, max_val, stat)
        stat = jnp.where(lane8 == 1, mx.astype(f32), stat)
        stat = jnp.where(lane8 == 2, my.astype(f32), stat)
        stat_ref[...] = stat
    return kernel



def make_kernel_i8box(noroll=False):
    """i8 scorer + matmul boxsum: the [256,256] double prefix-sum
    integral image is replaced by one [64,320]x[320,256] i8 ones-bank
    matmul (row-window sums of L-128) + an 8-pass lane prefix on the
    small [64,256] result. L is computed only on the 256x256 region.
    t_ref: [4096+64pad.., ...] -- here t bank [4096,256] i8 and the ones
    bank rides rows 4096..4159 of a [4224, 320]? No: separate ref via
    concat host-side is messy; instead obank is STATIC in-kernel (iota
    compare), cast to i8."""
    def kernel(img_ref, t_ref, sc_ref, sw_ref, stat_ref):
        v = img_ref[...]
        v256 = v[0:256, 0:256]
        b = (v256 & i32(255)).astype(f32)
        g = ((v256 >> 8) & i32(255)).astype(f32)
        r = ((v256 >> 16) & i32(255)).astype(f32)
        scale = f32(1.0) / f32(255.0)
        bs, gs, rs = b * scale, g * scale, r * scale
        vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
        vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
        l256 = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                        f32(0.0), f32(255.0))
        ltf = jnp.transpose(l256)                   # [col, row] f32
        lt8_256 = (ltf.astype(i32) - i32(128)).astype(jnp.int8)
        lt8 = jnp.concatenate(
            [lt8_256, jnp.zeros((64, 256), jnp.int8)], axis=0)  # [320,256]
        tb = t_ref[...]                             # [4096, 256] i8 bank

        cols = []
        for x32 in range(0, 64, 32):
            sl = lt8[x32:x32 + 256, :]
            rx = lax.dot_general(
                tb, sl,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=i32)         # [4096, 256] i32
            for d in range(32):
                blk = rx[d * 128:(d + 1) * 128, :]
                rr = blk if noroll else pltpu.roll(
                    blk, 0, 1, stride=1, stride_axis=0)
                cols.append(jnp.sum(rr, axis=0, keepdims=True))
        corrT_raw = jnp.concatenate(cols, axis=0)[0:OW, :]   # i32
        corrT = pltpu.roll(corrT_raw, 256 - (TH - 1), 1).astype(f32)

        # ---- boxsum via ones-bank matmul on L-128 ----
        ob_r = lax.broadcasted_iota(i32, (64, 320), 0)
        ob_c = lax.broadcasted_iota(i32, (64, 320), 1)
        obank = ((ob_c >= ob_r) & (ob_c < ob_r + i32(TW))).astype(jnp.int8)
        RT = lax.dot_general(
            obank, lt8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=i32)             # [64, 256] i32
        csRT = fe._prefix_sum(RT, 1)                # lane prefix
        a2 = pltpu.roll(csRT, 256 - (TH - 1), 1)    # csRT[., y+TH-1]
        b2 = pltpu.roll(csRT, 1, 1)                 # csRT[., y-1]
        yl64 = lax.broadcasted_iota(i32, (64, 256), 1)
        boxTp = (a2 - jnp.where(yl64 >= 1, b2, i32(0)))[0:OW, :]
        scoresT = corrT + sc_ref[1] * boxTp.astype(f32) + sc_ref[2]

        yl = lax.broadcasted_iota(i32, (OW, 256), 1)
        xr = lax.broadcasted_iota(i32, (OW, 256), 0)
        in_range = yl < i32(OH)
        neg = f32(-3.0e38)
        smask = jnp.where(in_range, scoresT, neg)
        max_val = jnp.max(smask)
        flat = yl * i32(OW) + xr
        cand = jnp.where(smask == max_val, flat, i32(OH_PAD * OW))
        sel = jnp.min(cand)
        my = sel // i32(OW)
        mx = sel % i32(OW)

        rot = pltpu.roll(v, i32(H_PAD) - my, 0)
        rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)
        sw_ref[...] = rot[0:SW_H, 0:SW_W]

        stat = jnp.zeros((8, 128), f32)
        lane8 = lax.broadcasted_iota(i32, (8, 128), 1)
        stat = jnp.where(lane8 == 0, max_val, stat)
        stat = jnp.where(lane8 == 1, mx.astype(f32), stat)
        stat = jnp.where(lane8 == 2, my.astype(f32), stat)
        stat_ref[...] = stat
    return kernel

def make_kernel(variant):
    if variant == "strided":
        return make_kernel_t()
    if variant == "mm8":
        return make_kernel_mm8()
    if variant == "i8":
        return make_kernel_i8()
    if variant == "i8box":
        return make_kernel_i8box()
    if variant == "i8boxnr":
        return make_kernel_i8box(noroll=True)
    def kernel(img_ref, t_ref, tmean_ref, sw_ref, stat_ref):
        v = img_ref[...]
        b = (v & i32(255)).astype(f32)
        g = ((v >> 8) & i32(255)).astype(f32)
        r = ((v >> 16) & i32(255)).astype(f32)
        scale = f32(1.0) / f32(255.0)
        bs, gs, rs = b * scale, g * scale, r * scale
        vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
        vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
        limg = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                        f32(0.0), f32(255.0))

        lane_r = lax.broadcasted_iota(i32, (256, R_PAD), 1)
        valid = lane_r < i32(TH)
        l256 = limg[0:256, 0:256]
        lt_bf16 = jnp.transpose(l256).astype(jnp.bfloat16)
        t_bf16 = t_ref[...].astype(jnp.bfloat16)
        cols = []
        for x in range(OW):
            sl = lt_bf16[x:x + K_PAD, :]
            if variant == "nomm":
                rx = jnp.full((256, R_PAD), f32(x)) + sl.astype(f32)[0:8, 0:128].max()
            else:
                rx = lax.dot_general(
                    sl, t_bf16,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=f32)
            if variant == "strided":
                # rx3[s, row] with ROW-REVERSED template (t_ref holds
                # T[TH-1-s]); the diagonal sum colT[y] = sum_s
                # rx3[s, y + TH-1 - s] is ONE strided lane rotate:
                # roll(x,sh,1)[.,j] = x[., j-sh], shift_s = s - (TH-1)
                # = 138 + s (mod 256) -> static base 138, stride 1
                # (per-vreg spread 7 < 128, which Mosaic supports).
                # Zero pad rows contribute nothing, so a plain
                # all-sublane sum finishes the column.
                rx3 = lax.dot_general(
                    t_bf16, sl,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)       # [R_PAD, 256]
                rx3 = pltpu.roll(rx3, 256 - (TH - 1), 1,
                                 stride=1, stride_axis=0)
                colT = jnp.sum(rx3, axis=0, keepdims=True)  # [1, 256]
                cols.append(colT)
                continue
            if variant == "nodiag":
                pass
            else:
                for bb in range(7):
                    shift = 1 << bb
                    rolled = pltpu.roll(rx, i32(256 - shift), 0)
                    rx = jnp.where((lane_r & i32(shift)) != i32(0),
                                   rolled, rx)
            col = jnp.sum(jnp.where(valid, rx, f32(0.0)),
                          axis=1, keepdims=True)
            cols.append(col[:OH_PAD, :])
        if variant == "strided":
            corrT = jnp.concatenate(cols, axis=0)     # [OW, 256]
            corr = jnp.transpose(corrT)[:OH_PAD, :]   # [OH_PAD, OW]
        else:
            corr = jnp.concatenate(cols, axis=1)

        cs = fe._prefix_sum(fe._prefix_sum(l256, 0), 1)
        sub = lax.broadcasted_iota(i32, (256, 256), 0)
        cs_r = jnp.where(sub >= 1, pltpu.roll(cs, 1, 0), f32(0.0))
        d = cs[TH - 1:TH - 1 + OH_PAD, :] - cs_r[0:OH_PAD, :]
        lane_d = lax.broadcasted_iota(i32, (OH_PAD, 256), 1)
        d_l = jnp.where(lane_d >= 1, pltpu.roll(d, 1, 1), f32(0.0))
        box = d[:, TW - 1:TW - 1 + OW] - d_l[:, 0:OW]
        scores = corr - tmean_ref[0] * box

        ssub = lax.broadcasted_iota(i32, (OH_PAD, OW), 0)
        slane = lax.broadcasted_iota(i32, (OH_PAD, OW), 1)
        in_range = ssub < i32(OH)
        neg = f32(-3.0e38)
        smask = jnp.where(in_range, scores, neg)
        max_val = jnp.max(smask)
        flat = ssub * i32(OW) + slane
        cand = jnp.where(smask == max_val, flat, i32(OH_PAD * OW))
        sel = jnp.min(cand)
        my = sel // i32(OW)
        mx = sel % i32(OW)

        rot = pltpu.roll(v, i32(H_PAD) - my, 0)
        rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)
        sw_ref[...] = rot[0:SW_H, 0:SW_W]

        stat = jnp.zeros((8, 128), f32)
        lane8 = lax.broadcasted_iota(i32, (8, 128), 1)
        stat = jnp.where(lane8 == 0, max_val, stat)
        stat = jnp.where(lane8 == 1, mx.astype(f32), stat)
        stat = jnp.where(lane8 == 2, my.astype(f32), stat)
        stat_ref[...] = stat
    return kernel


def run_variant(variant, img_pad, t_pad, tmean_a):
    t_shape = {"mm8": (1024, 256), "i8": (4096, 256), "i8box": (4096, 256), "i8boxnr": (4096, 256)}.get(
        variant, (R_PAD, K_PAD))
    with jax.enable_x64(False):
        sw, stat = pl.pallas_call(
            make_kernel(variant),
            out_shape=(
                jax.ShapeDtypeStruct((B * SW_H, SW_W), jnp.int32),
                jax.ShapeDtypeStruct((B * 8, 128), jnp.float32),
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((H_PAD, W_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(t_shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((SW_H, SW_W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        )(img_pad, t_pad, tmean_a)
    return sw, stat


t_pad_np = np.zeros((R_PAD, K_PAD), np.float32)
t_pad_np[:th, :tw] = pa.template_u8.astype(np.float32)
t_pad = jax.device_put(t_pad_np)
t_rev_np = np.zeros((R_PAD, K_PAD), np.float32)
t_rev_np[:th, :tw] = pa.template_u8.astype(np.float32)[::-1]
t_rev = jax.device_put(t_rev_np)
t8_np = np.zeros((1024, 256), np.float32)
for d in range(8):
    t8_np[d * 128:d * 128 + th, d:d + tw] = \
        pa.template_u8.astype(np.float32)[::-1]
t8 = jax.device_put(t8_np)
t32_np = np.zeros((4096, 256), np.int8)
for d in range(32):
    t32_np[d * 128:d * 128 + th, d:d + tw] = \
        (pa.template_u8.astype(np.int32)[::-1] - 128).astype(np.int8)
t32 = jax.device_put(t32_np)
c1 = np.float32(np.float64(128.0) - np.float64(tsum) / (th * tw))
c0 = np.float32(128.0 * tsum - 128.0 * 128.0 * th * tw)
tmean_a = jax.device_put(np.asarray([tmean], np.float32))
sc_a = jax.device_put(np.asarray([tmean, c1, c0], np.float32))
c0b = np.float32(np.float64(c0) + np.float64(c1) * 128.0 * th * tw)
sc_b = jax.device_put(np.asarray([tmean, c1, c0b], np.float32))
img_flat = packed.reshape(B * H_PAD, W_PAD)

# correctness: strided vs base
sw0, st0 = jax.jit(lambda a, b, c: run_variant("base", a, b, c))(
    img_flat, t_pad, tmean_a)
sw1, st1 = jax.jit(lambda a, b, c: run_variant("strided", a, b, c))(
    img_flat, t_rev, tmean_a)
print("strided == base:",
      bool(jnp.array_equal(sw0, sw1)), bool(jnp.array_equal(st0, st1)))
sw2, st2 = jax.jit(lambda a, b, c: run_variant("mm8", a, b, c))(
    img_flat, t8, tmean_a)
print("mm8 == base sw:", bool(jnp.array_equal(sw0, sw2)),
      " mm8 == strided stat:", bool(jnp.array_equal(st1, st2)),
      " max|dmv|:", float(jnp.abs(st1[:, 0] - st2[:, 0]).max()))
sw3, st3 = jax.jit(lambda a, b, c: run_variant("i8", a, b, c))(
    img_flat, t32, sc_a)
sw4, st4 = jax.jit(lambda a, b, c: run_variant("i8box", a, b, c))(
    img_flat, t32, sc_b)
print("i8box == base sw:", bool(jnp.array_equal(sw0, sw4)),
      " max|dmv| vs i8:", float(jnp.abs(st3[:, 0] - st4[:, 0]).max()))
print("i8 == base sw:", bool(jnp.array_equal(sw0, sw3)),
      " max|dmv| vs base:",
      float(jnp.abs(st0[:, 0, 0] - st3[:, 0, 0]).max()
            if st0.ndim == 3 else jnp.abs(st0[:, 0] - st3[:, 0]).max()))

for variant in ["i8box", "i8boxnr"]:
    @jax.jit
    def rep(img, t, tm):
        def one(i):
            sw, stat = run_variant(variant, img ^ i, t, tm)
            return stat[:, 0].sum()
        return lax.map(one, jnp.arange(REPS, dtype=jnp.int32)).sum()

    t_use = {"strided": t_rev, "mm8": t8, "i8": t32, "i8box": t32, "i8boxnr": t32}.get(variant, t_pad)
    tm_use = {"i8": sc_a, "i8box": sc_b, "i8boxnr": sc_b}.get(variant, tmean_a)
    r = float(rep(img_flat, t_use, tm_use))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(img_flat, t_use, tm_use))
        ts.append(time.perf_counter() - t0)
    print(f"{variant:8s} {min(ts) / REPS * 1e3:8.2f} ms/batch  [{r:.6e}]")
