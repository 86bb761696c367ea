"""Fourth-generation Pallas frontend kernel: packed-BGR image in, final
match scores + argmax location + dial-cluster superwindow out.

Fuses everything between JPEG crops and the per-dial window masks:

  1. unpack BGR from one i32 word per pixel (b | g<<8 | r<<16) — the
     host/XLA packs once; a channel-minor uint8 layout wastes 125/128
     of each vregister and a planar layout costs a 96 MB relayout;
  2. the exact cv2 lightness channel (f32 mul/add/rint only — the
     H/S channels need IEEE-exact division, which requires f64 emulation
     and stays in XLA on the 64x64 windows where it fuses for free);
  3. the TM_CCOEFF correlation on the **int8 MXU**: both operands are
     shifted by -128 (L-128 and T-128 fit int8 exactly), so the MXU
     accumulates the correlation in int32 EXACTLY (no f32 ordering
     error at all), at 2x the bf16 rate.  The -128 cross terms fold
     into the window boxsum:
         corr = corr8 + 128*box + 128*Tsum - 128^2*N
         scores = corr - tmean*box
                = corr8 + (128 - tmean)*box' + 128*(Tsum - N*tmean)
     where box' = box - 128*N is the boxsum of L-128.  With the exact
     rational tmean = Tsum/N the trailing constant would vanish, but
     the kernel (like cv2) uses the f32-rounded tmean, which leaves a
     small constant residual c0 = 128*(Tsum - N*tmean) (|c0| <~ 25);
     c0 is computed in f64 outside the kernel and folded into the
     scores explicitly, so the frontend carries no constant offset vs
     the corr - tmean*box formulation (borderline threshold decisions
     agree with the XLA paths).  |box'| < 2^24 so its f32 image is
     exact; the final scores see two f32 roundings (the c1*box'
     multiply-add and the +c0) — still tighter than cv2 3.4's own f32
     DFT pipeline (SURVEY.md §8bis.4).
  4. the x-offset loop is batched 32 columns per matmul through a
     [3840, 224] bank of column-shifted template copies (block d rows
     hold T[TH-1-s, c-d]); the template is ROW-REVERSED so that the
     per-column diagonal reduction corr[y] = sum_s rx[s, y + TH-1 - s]
     is ONE strided lane-rotate (tpu.dynamic_rotate stride=1 across
     sublanes, per-vreg spread 127 <= 128) + a sublane sum, instead of
     7 masked log-shift passes;
  5. the boxsum itself is an MXU job too: one [64, 320] static ones-
     bank matmul gives the 188-wide row-window sums, and an 8-pass lane
     prefix on the small [64, 256] result finishes the 119-tall column;
  6. in-kernel argmax with the reference's first-max row-major
     tie-break (meterelf/_utils.py:91-97 via cv2.minMaxLoc), computed
     in the transposed [OW, 256] orientation (x on sublanes);
  7. dynamic rotation of the packed image by (my, mx) — uniform-shift
     tpu.dynamic_rotate, the one dynamic indexing Mosaic supports — so
     the 136x256 superwindow containing all dial windows lands at a
     static position for zero-cost downstream slicing.

Measured on v5e (B=512, experiments/frontend_prof2.py): 7.7 ms/batch
for the gen-3 bf16 kernel -> 5.4 ms for this one, argmax bit-identical
on the full sample corpus.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_PAD = 264   # padded image rows (250 + superwindow slack, mult of 8)
W_PAD = 384   # padded image cols (lane rotates need a 128-multiple width)
STAGE = 256   # canonical [STAGE, STAGE] VMEM staging block per image
OH, OW, TH, TW = 132, 63, 119, 188   # the flagship-camera geometry
OH_PAD = 136
SW_H = 136    # superwindow rows  (>= template rows + margin, mult of 8)
SW_W = 256    # superwindow cols  (>= template cols + margin, mult of 128)
BANK_M = 3840  # (flagship) 32 column-shifted template copies x 120 rows
BANK_K = 224   # (flagship) template cols 188 + 31 shifts <= 219, 32-aligned
BLK = 120      # (flagship) rows per copy: 119 real + 1 pad (8-aligned
               # slices, strided-rotate spread 119 < 128)
SHEAR = os.environ.get("METERELF_FE_SHEAR", "1") != "0"
               # round-5 partial-shear correlation (on by default):
               # the right operand is sheared by j in [0, JG) lanes
               # (JG lane-rolled copies via the 4-sublane-packed i32
               # bitcast — Mosaic only rotates 32-bit data) and the
               # bank contracts over (j, c), so each bank row holds a
               # GROUP of JG template rows and the matmul emits
               # group-partial diagonal sums already y-aligned within
               # the group. The per-column VPU epilogue shrinks from a
               # [blk~120, 256] strided-roll+sum to an [NG=8, 256]
               # masked log-shift roll (tpu.dynamic_rotate only honors
               # stride=1 — a stride=JG roll is silently a no-op on
               # real hardware, experiments/shear_probe.py) + an 8-row
               # sum. Bit-identical on corpus + random frames, kernel
               # 3.03 -> 2.84 ms/256 incl. the ~1.9 ms harness floor
               # (experiments/frontend_shear.py, v5e 2026-08-21).
JG = 16        # shear width (template rows per bank group)
NG = 8         # groups per column; JG*NG = 128 >= th (th <= 128 is
               # already a kernel family constraint via blk <= 128)
XG = int(os.environ.get("METERELF_FE_XG", "32"))
               # correlation x-group size: template-copy column shifts
               # per matmul. 32 amortizes K=224 tiles over wide groups;
               # 4 cuts the bank contraction to K=192 (192/188 = 1.02
               # column inflation vs 224/188 = 1.19) at the cost of 16
               # smaller matmuls + non-32-aligned i8 sublane slices.
               # MEASURED (experiments/frontend_xg_ab.py, v5e
               # 2026-08-20): XG in {4, 8, 16, 32} all land within
               # +-1.3% (2.93-3.01 ms incl. ~1.9 ms floor), bit-parity
               # across the board — i.e. cutting the matmul's K MACs by
               # 14% moves nothing, so the split frontend kernel is NOT
               # correlation-matmul-bound; the remaining frontend
               # budget lives in the VPU stages (diagonal epilogue,
               # unpack/L, argmax, superwindow rotates). Default stays
               # 32 (the widest-tile, best-understood layout).


class FrontendGeom(NamedTuple):
    """Static per-camera kernel geometry. The kernel body is parametric
    over this (round-3 generalization: the (250,250)/(119,188) literals
    became the flagship instance of the family — the second shipped
    camera's 135x220 crop and the synthetic ALT_CAMERA's 200x210 crop /
    90x141 template ride the same kernel). Reference analog: the two
    shipped params.yml files (/root/reference/sample-images{1,2})."""

    crop_h: int   # true meter-rect crop rows (<= STAGE)
    crop_w: int   # true meter-rect crop cols (<= STAGE)
    th: int       # template rows
    tw: int       # template cols
    oh: int       # correlation output rows = crop_h - th + 1
    ow: int       # correlation output cols = crop_w - tw + 1 (<= 128)
    blk: int      # bank rows per shifted template copy (8-aligned >= th)
    bank_k: int   # bank contraction dim (tw + xg-1 shifts, 32-aligned)
    nx: int       # number of correlation matmuls = ceil(ow/xg)
    ow_pad: int   # 8-aligned >= ow (boxsum ones-bank rows)
    xg: int       # column shifts per matmul (module default XG)


def geom_for(crop_h: int, crop_w: int,
             th: int, tw: int) -> Optional[FrontendGeom]:
    """The FrontendGeom for a (crop, template) pair, or None when the
    geometry cannot ride the kernel's padded layout. Constraints:

    - staging: the crop must fit the [STAGE, STAGE] VMEM block;
    - x positions: ow <= 128 (the correlation scratch and the boxsum
      ones-bank carry at most 128 sublanes);
    - bank: blk = ceil8(th) <= 128 (the strided-rotate diagonal
      reduction's per-vreg spread is blk-1, hardware cap 128) and every
      xg-column input slice must stay inside the 320-row transposed
      image: (nx-1)*xg + bank_k <= STAGE + 64;
    - superwindow: dial windows are DIAL_WIN=64 squares clipped inside
      the template (params.py win_origin), so th in [64, SW_H] and
      tw in [64, SW_W] keep every window inside the extracted
      [SW_H, SW_W] superwindow."""
    oh, ow = crop_h - th + 1, crop_w - tw + 1
    if oh < 1 or not (1 <= ow <= 128):
        return None
    xg = XG
    blk = -(-th // 8) * 8
    bank_k = -(-(tw + xg) // 32) * 32
    nx = -(-ow // xg)
    ow_pad = -(-ow // 8) * 8
    if not (crop_h <= STAGE and crop_w <= STAGE
            and blk <= 128
            and (nx - 1) * xg + bank_k <= STAGE + 64
            and 64 <= th <= SW_H and 64 <= tw <= SW_W):
        return None
    return FrontendGeom(crop_h, crop_w, th, tw, oh, ow,
                        blk, bank_k, nx, ow_pad, xg)


def fits(crop_h: int, crop_w: int, th: int, tw: int) -> bool:
    """Can (crop_h, crop_w) crops with a (th, tw) template ride the
    fused frontend kernel? (See geom_for for the constraint list.)"""
    return geom_for(crop_h, crop_w, th, tw) is not None


def _prefix_sum(x, axis):
    n = x.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    b = 1
    while b < n:
        shifted = pltpu.roll(x, b, axis)
        x = jnp.where(idx >= jnp.int32(b), x + shifted, x)
        b *= 2
    return x


def _frontend_kernel(img_ref, bank_ref, c1_ref, sw_ref, stat_ref,
                     corr_ref, *, geom):
    """img_ref: [STAGE, STAGE] i32 packed BGR (crop zero padded; the
    superwindow rotates run on this staging block directly — see the
    sw-contract comment in _frontend_core; the legacy [H_PAD, W_PAD]
    shapes survive only as accepted staging aliases).
    bank_ref: [32*blk, bank_k] i8 shifted-template bank. c1_ref: [2] f32
    SMEM = (128 - template_mean, c0 residual — see module docstring).
    sw_ref: [SW_H, SW_W] i32 superwindow. stat_ref: [8, 128] f32."""
    max_val, mx, my, sw = _frontend_core(img_ref, bank_ref, c1_ref,
                                         corr_ref, geom)
    sw_ref[...] = sw
    stat_ref[...] = _stat_tile(max_val, mx, my)


def _frontend_windows_kernel(img_ref, bank_ref, c1_ref, disk_ref, cr_ref,
                             hs_ref, bits_ref, stat_ref, corr_ref, *,
                             geom, origins, centers, div_impl):
    """Merged frontend+windows kernel: the superwindow never leaves
    VMEM — the window-mask stage (ops/pallas_windows.bits_from_sw) runs
    on the in-register superwindow value, so its [SW_H, SW_W] i32 HBM
    write+read and the separate dispatch disappear. Output is the
    packed window-bit quad the CCL kernel consumes directly."""
    from .pallas_windows import bits_from_sw
    max_val, mx, my, sw = _frontend_core(img_ref, bank_ref, c1_ref,
                                         corr_ref, geom)
    bits_ref[...] = bits_from_sw(
        sw, disk_ref[...], cr_ref, hs_ref[0],
        origins=origins, centers=centers, div_impl=div_impl)
    stat_ref[...] = _stat_tile(max_val, mx, my)


def _frontend_core(img_ref, bank_ref, c1_ref, corr_ref, geom):
    """Shared scorer body -> (max_val, mx, my, superwindow VALUE)."""
    i32 = jnp.int32
    f32 = jnp.float32
    g = geom

    v256 = img_ref[...]
    b_pl = (v256 & i32(255)).astype(f32)
    g_pl = ((v256 >> 8) & i32(255)).astype(f32)
    r_pl = ((v256 >> 16) & i32(255)).astype(f32)
    # exact cv2 L channel (ops/color.py lightness_from_planes semantics)
    scale = f32(1.0) / f32(255.0)
    bs, gs, rs = b_pl * scale, g_pl * scale, r_pl * scale
    vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
    vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
    l256 = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                    f32(0.0), f32(255.0))           # [STAGE, STAGE] f32

    # ---- correlation on the int8 MXU (transposed orientation) ----
    # convert to int8 BEFORE transposing: 4x less data to shuffle
    l8 = (l256.astype(i32) - i32(128)).astype(jnp.int8)
    lt8 = jnp.concatenate(
        [jnp.transpose(l8),
         jnp.zeros((64, STAGE), jnp.int8)], axis=0)  # [STAGE+64] L-128
    bank = bank_ref[...]

    for x32 in range(0, g.nx * g.xg, g.xg):
        sl = lt8[x32:x32 + g.bank_k, :]
        if SHEAR:
            # sheared right operand: block j holds sl lane-rolled left
            # by j (j32 bitcast: Mosaic only rotates 32-bit data; lane
            # rolls of the 4-sublane-packed view shift every i8 row)
            w = pltpu.bitcast(sl, jnp.int32)     # [bank_k//4, 256]
            sh = jnp.concatenate(
                [sl] + [pltpu.bitcast(pltpu.roll(w, STAGE - j, 1),
                                      jnp.int8)
                        for j in range(1, JG)],
                axis=0)                          # [JG*bank_k, 256] i8
            rx = lax.dot_general(
                bank, sh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=i32)      # [xg*NG, STAGE] i32
            for d in range(min(g.xg, g.ow - x32)):
                blk = rx[d * NG:(d + 1) * NG, :]
                # corr[y] = sum_r blk[r, y + JG*(NG-1-r)] (bank groups
                # are REVERSED so the per-row shift is +JG*r): roll row
                # r right by JG*r via log2(NG) masked power-of-two
                # rolls, then one 8-row sublane sum; output lane
                # y + JG*(NG-1)
                rr = blk
                rid = lax.broadcasted_iota(i32, (NG, STAGE), 0)
                b = 1
                while b < NG:
                    rolled = pltpu.roll(rr, JG * b, 1)
                    rr = jnp.where((rid & b) != 0, rolled, rr)
                    b *= 2
                corr_ref[x32 + d, :] = jnp.sum(rr, axis=0)
        else:
            rx = lax.dot_general(
                bank, sl,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=i32)      # [xg*blk, STAGE] i32
            for d in range(min(g.xg, g.ow - x32)):
                blk = rx[d * g.blk:(d + 1) * g.blk, :]
                # corr[y, x32+d] = sum_s blk[s, y + th-1 - s]: one
                # strided rotate (shift_s = s) + sublane sum; output
                # lane y + th-1. Rows land in a VMEM scratch ref — a
                # 64-way concat of single-row vregs would repack
                # 7/8-empty tiles instead.
                rr = pltpu.roll(blk, 0, 1, stride=1, stride_axis=0)
                corr_ref[x32 + d, :] = jnp.sum(rr, axis=0)
    corrT_raw = corr_ref[...][0:g.ow, :]
    corr_off = JG * (NG - 1) if SHEAR else g.th - 1
    corrT = pltpu.roll(corrT_raw, STAGE - corr_off, 1).astype(f32)

    # ---- boxsum of L-128 via a static ones-bank matmul ----
    ob_r = lax.broadcasted_iota(i32, (g.ow_pad, STAGE + 64), 0)
    ob_c = lax.broadcasted_iota(i32, (g.ow_pad, STAGE + 64), 1)
    obank = ((ob_c >= ob_r) & (ob_c < ob_r + i32(g.tw))).astype(jnp.int8)
    rt = lax.dot_general(
        obank, lt8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=i32)             # [ow_pad, STAGE] row sums
    cs = _prefix_sum(rt, 1)
    top = pltpu.roll(cs, STAGE - (g.th - 1), 1)     # cs[., y + th-1]
    bot = pltpu.roll(cs, 1, 1)                      # cs[., y - 1]
    ylp = lax.broadcasted_iota(i32, (g.ow_pad, STAGE), 1)
    boxT = (top - jnp.where(ylp >= 1, bot, i32(0)))[0:g.ow, :]
    scoresT = (corrT + c1_ref[0] * boxT.astype(f32)
               + c1_ref[1])                         # [ow, STAGE]

    # ---- argmax with first-max row-major tie-break (x on sublanes) ----
    xr = lax.broadcasted_iota(i32, (g.ow, STAGE), 0)
    yl = lax.broadcasted_iota(i32, (g.ow, STAGE), 1)
    in_range = yl < i32(g.oh)
    neg = f32(-3.0e38)
    smask = jnp.where(in_range, scoresT, neg)
    max_val = jnp.max(smask)
    flat = yl * i32(g.ow) + xr
    cand = jnp.where(smask == max_val, flat, i32(g.oh * g.ow))
    sel = jnp.min(cand)
    my = sel // i32(g.ow)
    mx = sel % i32(g.ow)

    # ---- superwindow extraction: rotate rows by my, cols by mx ----
    # Rotates run on the [STAGE, STAGE] staging block directly (round 5:
    # building the [H_PAD, W_PAD] zero pad + rotating it cost ~170 extra
    # vreg-ops/image). Cells wrapping past the staging edge now carry
    # image content instead of pad zeros, but every cell downstream
    # consumers read lies INSIDE the template box (windows are DIAL_WIN
    # squares clipped into it, params.py win_origin), and consumed <
    # wrap holds for the whole geometry family: consumed rows i <= th-1
    # and garbage starts at i = STAGE - my >= STAGE - crop_h + th, so
    # crop_h <= STAGE suffices (same argument in columns). The sw
    # CONTRACT is therefore: bit-exact within [0:th, 0:tw], unspecified
    # beyond (tests/test_ops.py pins it that way).
    rot = pltpu.roll(v256, i32(STAGE) - my, 0)      # row i <- row i+my
    rot = pltpu.roll(rot, i32(STAGE) - mx, 1)       # col j <- col j+mx
    return max_val, mx, my, rot[0:SW_H, 0:SW_W]


def _stat_tile(max_val, mx, my):
    i32 = jnp.int32
    f32 = jnp.float32
    stat = jnp.zeros((8, 128), f32)
    lane8 = lax.broadcasted_iota(i32, (8, 128), 1)
    stat = jnp.where(lane8 == 0, max_val, stat)
    stat = jnp.where(lane8 == 1, mx.astype(f32), stat)
    stat = jnp.where(lane8 == 2, my.astype(f32), stat)
    return stat


def _template_bank(template_u8: jnp.ndarray,
                   geom: FrontendGeom) -> jnp.ndarray:
    """The correlation bank for the active formulation (SHEAR knob).

    Strided-rotate form: [xg*blk, bank_k] int8, block d (rows d*blk..)
    holds the row-reversed, -128-shifted template at column offset d:
    bank[d*blk + s, c] = T[th-1-s, c-d] - 128 (0 off-support).

    Shear form: [xg*NG, JG*bank_k] int8, K-order (j, c) j-major; row
    (d, r) holds template-row GROUP (NG-1-r) at column offset d:
    bank[d*NG + r, j*bank_k + c] = T[JG*(NG-1-r) + j, c-d] - 128.
    Groups are reversed so the epilogue's per-row shift is +JG*r."""
    if SHEAR:
        tz = jnp.pad(
            (template_u8.astype(jnp.int32) - 128).astype(jnp.int8),
            ((0, JG * NG - geom.th), (0, 0)))      # [128, tw]
        tr = tz.reshape(NG, JG, geom.tw)[::-1]     # group-reversed
        blocks = [
            jnp.pad(tr, ((0, 0), (0, 0),
                         (d, geom.bank_k - geom.tw - d)))
            .reshape(NG, JG * geom.bank_k)
            for d in range(geom.xg)
        ]
        return jnp.concatenate(blocks, axis=0)
    t_rev = (template_u8[::-1].astype(jnp.int32) - 128).astype(jnp.int8)
    blocks = [
        jnp.pad(t_rev, ((0, geom.blk - geom.th),
                        (d, geom.bank_k - geom.tw - d)))
        for d in range(geom.xg)
    ]
    return jnp.concatenate(blocks, axis=0)


def _resolve_geom(packed_img: jnp.ndarray, template_u8: jnp.ndarray,
                  crop_hw) -> FrontendGeom:
    """The FrontendGeom for a call: crop_hw when given (the batch may
    arrive pre-staged at (STAGE, STAGE) or the legacy padded shape),
    else the batch's own shape — falling back to the flagship crop when
    the shape is a staging alias (pre-generalization callers)."""
    th, tw = (int(template_u8.shape[0]), int(template_u8.shape[1]))
    if crop_hw is None:
        hw = tuple(int(v) for v in packed_img.shape[1:3])
        crop_hw = (250, 250) if hw in ((STAGE, STAGE), (H_PAD, W_PAD)) \
            else hw
    geom = geom_for(int(crop_hw[0]), int(crop_hw[1]), th, tw)
    assert geom is not None, (
        f"geometry crop={crop_hw} template={(th, tw)} outside the "
        "frontend shape family (see geom_for())")
    return geom


def _stage_img(packed_img: jnp.ndarray,
               geom: FrontendGeom) -> jnp.ndarray:
    """Stage a [B, H, W] packed-BGR batch to the kernels' canonical
    [B*STAGE, STAGE] VMEM block layout (shared by frontend_pallas and
    frontend_windows_pallas — keep the accepted geometries in sync)."""
    B, H, W = packed_img.shape
    assert (H, W) in ((geom.crop_h, geom.crop_w), (STAGE, STAGE),
                      (H_PAD, W_PAD)), (
        f"batch staged at {(H, W)}, expected the true crop "
        f"{(geom.crop_h, geom.crop_w)} or a staging alias")
    if (H, W) == (STAGE, STAGE):     # host staged the canonical shape
        return packed_img.reshape(B * STAGE, STAGE)
    if (H, W) == (H_PAD, W_PAD):     # legacy padded geometry
        return packed_img[:, :STAGE, :STAGE].reshape(B * STAGE, STAGE)
    img_pad = jnp.zeros((B, STAGE, STAGE), jnp.int32)
    img_pad = img_pad.at[:, :H, :W].set(packed_img)
    return img_pad.reshape(B * STAGE, STAGE)


def frontend_pallas(
    packed_img: jnp.ndarray,    # [B, H, W] i32 packed BGR
    template_u8: jnp.ndarray,   # [th, tw]
    template_mean: float,       # f32 scalar (Tsum / (th*tw))
    interpret: bool = False,
    crop_hw: Optional[tuple] = None,  # true (H, W) of the meter crop
) -> tuple:
    """-> (max_val [B] f32, mx [B] i32, my [B] i32,
           superwindow [B, SW_H, SW_W] i32 packed BGR at (my, mx))."""
    import functools

    B = packed_img.shape[0]
    geom = _resolve_geom(packed_img, template_u8, crop_hw)
    img_pad = _stage_img(packed_img, geom)
    c1 = _c1_for(template_u8, template_mean)

    with jax.enable_x64(False):
        bank = _template_bank(template_u8, geom)
        sw, stat = pl.pallas_call(
            functools.partial(_frontend_kernel, geom=geom),
            out_shape=(
                jax.ShapeDtypeStruct((B * SW_H, SW_W), jnp.int32),
                jax.ShapeDtypeStruct((B * 8, 128), jnp.float32),
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((STAGE, STAGE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(bank.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((SW_H, SW_W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((geom.nx * geom.xg, STAGE),
                                       jnp.int32)],
            interpret=interpret,
        )(img_pad, bank, c1)

    sw = sw.reshape(B, SW_H, SW_W)
    stat = stat.reshape(B, 8, 128)
    max_val = stat[:, 0, 0]
    mx = stat[:, 0, 1].astype(jnp.int32)
    my = stat[:, 0, 2].astype(jnp.int32)
    return max_val, mx, my, sw


def _c1_for(template_u8: jnp.ndarray, template_mean) -> jnp.ndarray:
    """(128 - tmean, c0 residual) — see the module docstring, item 3."""
    th, tw = template_u8.shape
    tmean32 = jnp.asarray(template_mean, jnp.float32)
    tsum64 = jnp.sum(template_u8.astype(jnp.float64))
    c0 = (jnp.float64(128.0)
          * (tsum64 - jnp.float64(th * tw) * tmean32.astype(jnp.float64))
          ).astype(jnp.float32)
    return jnp.stack([jnp.float32(128.0) - tmean32, c0])


def frontend_windows_pallas(
    packed_img: jnp.ndarray,    # [B, H, W] i32 packed BGR
    template_u8: jnp.ndarray,   # [th, tw]
    template_mean: float,       # f32 scalar (Tsum / (th*tw))
    disk_quad: jnp.ndarray,     # [64, 256] i32 static disk quad (0/1)
    color_range: jnp.ndarray,   # [D<=8, 3] i32
    hue_shift: int,
    origins: tuple,             # ((ox, oy) per dial), python ints
    centers: tuple,             # ((cx, cy) per dial), python ints
    interpret: bool = False,
    crop_hw: Optional[tuple] = None,  # true (H, W) of the meter crop
) -> tuple:
    """Merged frontend+windows call: -> (max_val [B] f32, mx [B] i32,
    my [B] i32, bits [B, 64, 256] i32 packed window-mask quad — the
    propagate_quads input). The superwindow stays in VMEM."""
    import contextlib
    import functools

    B = packed_img.shape[0]
    D = len(origins)
    assert D * 64 == 256, "merged kernel is specialized to 4 dials"
    geom = _resolve_geom(packed_img, template_u8, crop_hw)
    img_pad = _stage_img(packed_img, geom)
    c1 = _c1_for(template_u8, template_mean)

    cr = jnp.zeros((8, 128), jnp.int32)
    cr = cr.at[:D, :3].set(color_range.astype(jnp.int32))
    hs = jnp.asarray(hue_shift, jnp.int32).reshape(1)

    kernel = functools.partial(
        _frontend_windows_kernel,
        geom=geom,
        origins=tuple((int(x), int(y)) for x, y in origins),
        centers=tuple((int(x), int(y)) for x, y in centers),
        div_impl="f64" if interpret else "dekker")

    ctx = (contextlib.nullcontext() if interpret    # f64 div needs x64
           else jax.enable_x64(False))
    with ctx:
        bank = _template_bank(template_u8, geom)
        bits, stat = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B * 64, 256), jnp.int32),
                jax.ShapeDtypeStruct((B * 8, 128), jnp.float32),
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((STAGE, STAGE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(bank.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((64, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((64, 256), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((geom.nx * geom.xg, STAGE),
                                       jnp.int32)],
            interpret=interpret,
        )(img_pad, bank, c1, disk_quad, cr, hs)

    bits = bits.reshape(B, 64, 256)
    stat = stat.reshape(B, 8, 128)
    max_val = stat[:, 0, 0]
    mx = stat[:, 0, 1].astype(jnp.int32)
    my = stat[:, 0, 2].astype(jnp.int32)
    return max_val, mx, my, bits

