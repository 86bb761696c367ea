"""Second-generation Pallas TM_CCOEFF kernel: correlation AND the
mean-term boxsum fused in one VMEM-resident pass.

v1 (pallas_match.py) computed only the raw correlation on-chip and left
the boxsum to an XLA integral image — measured at 8 ms/batch of pure
HBM traffic, plus ~2.7 ms for the transpose+pad input prep. Here:

- the kernel takes the UNTRANSPOSED zero-padded lightness [256, 256]
  (prep is a cheap pad, no relayout) and transposes in VMEM for the
  per-column MXU slices;
- the integral image is 16 masked log-shift prefix-sum steps on the
  VMEM-resident image; the four corner terms come from static slices,
  so `box` falls out already in output layout;
- outputs scores = corr - tmean * box directly (tmean rides SMEM).

Numerics identical to v1 + XLA boxsum: the correlation matmul is exact
(bf16 inputs are exact for integers <= 255, f32 accumulation over 188
products stays < 2^24), and box <= 188*119*255 < 2^23 is exact in f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_match import H_PAD, W_PAD, R_PAD, K_PAD

# the reference shape family (250x250 crop, 188x119 template); the
# kernel itself is parametric — fits() decides whether a geometry can
# ride the same padded layout (e.g. the second shipped camera's
# 220x135 crop: oh=17, ow=33)
OH, OW, TH, TW = 132, 63, 119, 188
OH_PAD = 136


def fits(h: int, w: int, th: int, tw: int) -> bool:
    """Can (h, w) crops with a (th, tw) template ride the kernel's
    padded geometry? Needs the image inside [H_PAD, W_PAD], the
    template inside [R_PAD, K_PAD], every column slice in bounds, the
    log-shift diagonal's 7 steps (th <= 128), and the boxsum row range
    inside the pad."""
    oh, ow = h - th + 1, w - tw + 1
    if oh < 1 or ow < 1:
        return False
    oh_pad = -(-oh // 8) * 8
    return (h <= H_PAD and w <= W_PAD
            and th <= min(R_PAD, 128) and tw <= K_PAD
            and ow - 1 + K_PAD <= W_PAD
            and th - 1 + oh_pad <= H_PAD
            and oh_pad + th - 1 <= H_PAD)


def _prefix_sum(x, axis):
    """Inclusive prefix sum along axis via masked log-shifts."""
    n = x.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    b = 1
    while b < n:
        shifted = pltpu.roll(x, b, axis)
        x = jnp.where(idx >= jnp.int32(b), x + shifted, x)
        b *= 2
    return x


def _fused_kernel(l_ref, t_ref, tmean_ref, out_ref, *,
                  oh_pad: int = OH_PAD, ow: int = OW,
                  th: int = TH, tw: int = TW):
    """l_ref: [H_PAD, W_PAD] f32 zero-padded lightness (NOT transposed).
    t_ref: [R_PAD, K_PAD] f32 zero-padded template.
    tmean_ref: [1] f32 in SMEM. out_ref: [oh_pad, ow] f32 final scores."""
    i32 = jnp.int32
    f32 = jnp.float32
    lane_r = lax.broadcasted_iota(i32, (H_PAD, R_PAD), 1)
    valid = lane_r < i32(th)

    limg = l_ref[...]
    lt_bf16 = jnp.transpose(limg).astype(jnp.bfloat16)   # [W_PAD, H_PAD]
    t_bf16 = t_ref[...].astype(jnp.bfloat16)

    cols = []
    for x in range(ow):
        sl = lt_bf16[x:x + K_PAD, :]
        rx = lax.dot_general(
            sl, t_bf16,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32,
        )                                      # [H_PAD, R_PAD]
        for b in range(7):
            shift = 1 << b
            rolled = pltpu.roll(rx, i32(H_PAD - shift), 0)
            rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        col = jnp.sum(jnp.where(valid, rx, f32(0.0)),
                      axis=1, keepdims=True)   # [H_PAD, 1]
        cols.append(col[:oh_pad, :])
    corr = jnp.concatenate(cols, axis=1)       # [oh_pad, ow]

    # integral image in VMEM (values integer <= 255; all partial sums
    # < 2^23, exact in f32)
    cs = _prefix_sum(_prefix_sum(limg, 0), 1)  # [H_PAD, W_PAD] inclusive
    sub = lax.broadcasted_iota(i32, (H_PAD, W_PAD), 0)
    lane = lax.broadcasted_iota(i32, (H_PAD, W_PAD), 1)
    # exclusive-shifted copies: row/col -1 reads as 0
    cs_r = jnp.where(sub >= 1, pltpu.roll(cs, 1, 0), f32(0.0))   # A[y-1, x]
    d_hi = cs[th - 1:th - 1 + oh_pad, :]       # A[y+th-1, x]
    d_lo = cs_r[0:oh_pad, :]                   # A[y-1,    x]
    d = d_hi - d_lo                            # [oh_pad, W_PAD] row-range sums
    lane_d = lax.broadcasted_iota(i32, (oh_pad, W_PAD), 1)
    d_l = jnp.where(lane_d >= 1, pltpu.roll(d, 1, 1), f32(0.0))  # D[y, x-1]
    box = d[:, tw - 1:tw - 1 + ow] - d_l[:, 0:ow]                # [oh_pad, ow]

    out_ref[...] = corr - tmean_ref[0] * box


def match_scores_pallas_fused(
    lightness_f32: jnp.ndarray,   # [B, H, W] f32
    template_u8: jnp.ndarray,     # [th, tw]
    template_mean: float,         # f32 scalar
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W = lightness_f32.shape
    th, tw = template_u8.shape
    assert fits(H, W, th, tw), (
        "geometry outside the padded shape family (see fits())")
    oh, ow = H - th + 1, W - tw + 1
    oh_pad = -(-oh // 8) * 8

    l_pad = jnp.zeros((B, H_PAD, W_PAD), jnp.float32)
    l_pad = l_pad.at[:, :H, :W].set(lightness_f32)
    l_pad = l_pad.reshape(B * H_PAD, W_PAD)
    t_pad = jnp.zeros((R_PAD, K_PAD), jnp.float32)
    t_pad = t_pad.at[:th, :tw].set(template_u8.astype(jnp.float32))
    tmean = jnp.asarray(template_mean, jnp.float32).reshape(1)

    kernel = functools.partial(
        _fused_kernel, oh_pad=oh_pad, ow=ow, th=th, tw=tw)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * oh_pad, ow), jnp.float32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((H_PAD, W_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_PAD, K_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((oh_pad, ow), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(l_pad, t_pad, tmean)
    return out.reshape(B, oh_pad, ow)[:, :oh, :ow]
