"""Third-generation Pallas frontend kernel: packed-BGR image in, final
match scores + argmax location + dial-cluster superwindow out.

Fuses everything between JPEG crops and the per-dial window masks:

  1. unpack BGR from one i32 word per pixel (b | g<<8 | r<<16) — the
     host/XLA packs once; a channel-minor uint8 layout wastes 125/128
     of each vреgister and a planar layout costs a 96 MB relayout;
  2. the exact cv2 lightness channel (f32 mul/add/rint only — the
     H/S channels need IEEE-exact division, which requires f64 emulation
     and stays in XLA on the 64x64 windows where it fuses for free);
  3. the TM_CCOEFF correlation + integral-image boxsum of
     pallas_match2;
  4. in-kernel argmax with the reference's first-max row-major
     tie-break (meterelf/_utils.py:91-97 via cv2.minMaxLoc);
  5. dynamic rotation of the packed image by (my, mx) — uniform-shift
     tpu.dynamic_rotate, the one dynamic indexing Mosaic supports — so
     the 136x256 superwindow containing all dial windows lands at a
     static position for zero-cost downstream slicing.

Replaced XLA stages measured 2.2 ms (planar+L) + 6.9 ms (window gather)
per 512-batch; the scorer itself is unchanged from pallas_match2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_PAD = 264   # padded image rows (250 + superwindow slack, mult of 8)
W_PAD = 384   # padded image cols (lane rotates need a 128-multiple width)
R_PAD = 128
K_PAD = 192
OH, OW, TH, TW = 132, 63, 119, 188
OH_PAD = 136
SW_H = 136    # superwindow rows  (>= TH + margin, mult of 8)
SW_W = 256    # superwindow cols  (>= TW + margin, mult of 128)


def _prefix_sum(x, axis):
    n = x.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    b = 1
    while b < n:
        shifted = pltpu.roll(x, b, axis)
        x = jnp.where(idx >= jnp.int32(b), x + shifted, x)
        b *= 2
    return x


def _frontend_kernel(img_ref, t_ref, tmean_ref, sw_ref, stat_ref):
    """img_ref: [H_PAD, W_PAD] i32 packed BGR (zero padded).
    t_ref: [R_PAD, K_PAD] f32. tmean_ref: [1] f32 SMEM.
    sw_ref: [SW_H, SW_W] i32 superwindow. stat_ref: [8, 128] f32."""
    i32 = jnp.int32
    f32 = jnp.float32

    v = img_ref[...]
    b = (v & i32(255)).astype(f32)
    g = ((v >> 8) & i32(255)).astype(f32)
    r = ((v >> 16) & i32(255)).astype(f32)
    # exact cv2 L channel (ops/color.py lightness_from_planes semantics)
    scale = f32(1.0) / f32(255.0)
    bs, gs, rs = b * scale, g * scale, r * scale
    vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
    vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
    limg = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                    f32(0.0), f32(255.0))          # [H_PAD, W_PAD] f32

    # ---- correlation (pallas_match2 structure) ----
    lane_r = lax.broadcasted_iota(i32, (256, R_PAD), 1)
    valid = lane_r < i32(TH)
    # matcher works on the 256x256 region (image is 250x250 + zeros)
    l256 = limg[0:256, 0:256]
    lt_bf16 = jnp.transpose(l256).astype(jnp.bfloat16)
    t_bf16 = t_ref[...].astype(jnp.bfloat16)
    cols = []
    for x in range(OW):
        sl = lt_bf16[x:x + K_PAD, :]
        rx = lax.dot_general(
            sl, t_bf16, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32)
        for bb in range(7):
            shift = 1 << bb
            rolled = pltpu.roll(rx, i32(256 - shift), 0)
            rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        col = jnp.sum(jnp.where(valid, rx, f32(0.0)),
                      axis=1, keepdims=True)
        cols.append(col[:OH_PAD, :])
    corr = jnp.concatenate(cols, axis=1)            # [OH_PAD, OW]

    cs = _prefix_sum(_prefix_sum(l256, 0), 1)
    sub = lax.broadcasted_iota(i32, (256, 256), 0)
    cs_r = jnp.where(sub >= 1, pltpu.roll(cs, 1, 0), f32(0.0))
    d = cs[TH - 1:TH - 1 + OH_PAD, :] - cs_r[0:OH_PAD, :]
    lane_d = lax.broadcasted_iota(i32, (OH_PAD, 256), 1)
    d_l = jnp.where(lane_d >= 1, pltpu.roll(d, 1, 1), f32(0.0))
    box = d[:, TW - 1:TW - 1 + OW] - d_l[:, 0:OW]
    scores = corr - tmean_ref[0] * box              # [OH_PAD, OW]

    # ---- argmax with first-max row-major tie-break ----
    ssub = lax.broadcasted_iota(i32, (OH_PAD, OW), 0)
    slane = lax.broadcasted_iota(i32, (OH_PAD, OW), 1)
    in_range = ssub < i32(OH)                       # OW == 63 exactly
    neg = f32(-3.0e38)
    smask = jnp.where(in_range, scores, neg)
    max_val = jnp.max(smask)
    flat = ssub * i32(OW) + slane
    cand = jnp.where(smask == max_val, flat, i32(OH_PAD * OW))
    sel = jnp.min(cand)
    my = sel // i32(OW)
    mx = sel % i32(OW)

    # ---- superwindow extraction: rotate rows by my, cols by mx ----
    rot = pltpu.roll(v, i32(H_PAD) - my, 0)         # row i <- row i+my
    rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)       # col j <- col j+mx
    sw_ref[...] = rot[0:SW_H, 0:SW_W]

    stat = jnp.zeros((8, 128), f32)
    lane8 = lax.broadcasted_iota(i32, (8, 128), 1)
    stat = jnp.where(lane8 == 0, max_val, stat)
    stat = jnp.where(lane8 == 1, mx.astype(f32), stat)
    stat = jnp.where(lane8 == 2, my.astype(f32), stat)
    stat_ref[...] = stat


def frontend_pallas(
    packed_img: jnp.ndarray,    # [B, H, W] i32 packed BGR
    template_u8: jnp.ndarray,   # [th, tw]
    template_mean,              # f32 scalar
    interpret: bool = False,
):
    """-> (max_val [B] f32, mx [B] i32, my [B] i32,
           superwindow [B, SW_H, SW_W] i32 packed BGR at (my, mx))."""
    B, H, W = packed_img.shape
    th, tw = template_u8.shape
    assert ((H, W) in ((250, 250), (H_PAD, W_PAD))) and (th, tw) == (TH, TW), (
        "pallas frontend is specialized to the meterelf shape family")

    if (H, W) == (H_PAD, W_PAD):     # host staged the padding already
        img_pad = packed_img.reshape(B * H_PAD, W_PAD)
    else:
        img_pad = jnp.zeros((B, H_PAD, W_PAD), jnp.int32)
        img_pad = img_pad.at[:, :H, :W].set(packed_img)
        img_pad = img_pad.reshape(B * H_PAD, W_PAD)
    t_pad = jnp.zeros((R_PAD, K_PAD), jnp.float32)
    t_pad = t_pad.at[:th, :tw].set(template_u8.astype(jnp.float32))
    tmean = jnp.asarray(template_mean, jnp.float32).reshape(1)

    with jax.enable_x64(False):
        sw, stat = pl.pallas_call(
            _frontend_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B * SW_H, SW_W), jnp.int32),
                jax.ShapeDtypeStruct((B * 8, 128), jnp.float32),
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((H_PAD, W_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_PAD, K_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((SW_H, SW_W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(img_pad, t_pad, tmean)

    sw = sw.reshape(B, SW_H, SW_W)
    stat = stat.reshape(B, 8, 128)
    max_val = stat[:, 0, 0]
    mx = stat[:, 0, 1].astype(jnp.int32)
    my = stat[:, 0, 2].astype(jnp.int32)
    return max_val, mx, my, sw
