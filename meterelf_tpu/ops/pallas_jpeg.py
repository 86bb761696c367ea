"""Pallas TPU kernel for the JPEG back-half tail: fancy h2v2 chroma
upsampling + fixed-point YCbCr->BGR + crop/pack, fused in VMEM.

The XLA formulation of this tail costs ~1.1 ms/256 (upsample 0.7 +
color/crop/pack 0.4, HBM-bound: the interleave stacks and crop slices
each materialize). Here each image's planes stay in VMEM end to end and
only the u8 inputs and the packed i32 staging output touch HBM.

Layout trick: Mosaic lowers SUBLANE interleaves (stack axis=1 +
reshape) and 2D transposes, but not lane interleaves — so the x2
upsampling interleaves on sublanes in both orientations with a
transpose between:

    chroma [CH, CW]  --vertical colsums + sublane interleave-->
    cs [2CH, CW]     --transpose-->
    csT [CW, 2CH]    --horizontal filter + sublane interleave-->
    outT [2CW, 2CH]  --transpose--> [2CH, 2CW]

Numerics are bit-identical to ops/jpegdec.py's XLA path (the library
contract: jdsample.c h2v2_fancy_upsample + jdcolor.c fixed-point
conversion); tests/test_jpegdec.py proves equality on the corpus and
under fuzz through whichever path is active, and test_pallas_tail
compares the two paths directly.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jpegdec import (CoefWindow, _FIX_1_40200, _FIX_1_77200,
                      _FIX_0_71414, _FIX_0_34414, _ONE_HALF, _SCALEBITS)


GT = int(os.environ.get("METERELF_JPEG_TAIL_GT", "8"))
                  # images per program (launch-overhead amortization)


def _interleave_sublanes(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[S, L] x 2 -> [2S, L] with rows a0 b0 a1 b1 ... (Mosaic lowers
    this stack+reshape; the lane-axis analog does not)."""
    s, l = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * s, l)


def _upsample_plane(c: jnp.ndarray, ch_valid: int,
                    cw_valid: int) -> jnp.ndarray:
    """[CH, CW] i32 chroma -> [2CH, 2CW] i32, libjpeg triangle filter.
    Neighbor clamp fixups apply only at the image edge mapped into
    window coordinates (rows/cols past the valid bound are block
    padding whose outputs the caller discards)."""
    i32 = jnp.int32
    ch, cw = c.shape
    row = lax.broadcasted_iota(i32, (ch, cw), 0)
    up = jnp.where(row == 0, c, pltpu.roll(c, 1, 0))
    dn = jnp.where(row == i32(ch_valid - 1), c,
                   pltpu.roll(c, ch - 1, 0))
    cs = _interleave_sublanes(3 * c + up, 3 * c + dn)     # [2CH, CW]
    cst = cs.T                                            # [CW, 2CH]
    srow = lax.broadcasted_iota(i32, (cw, 2 * ch), 0)
    lf = jnp.where(srow == 0, cst, pltpu.roll(cst, 1, 0))
    rt = jnp.where(srow == i32(cw_valid - 1), cst,
                   pltpu.roll(cst, cw - 1, 0))
    o_even = (3 * cst + lf + 8) >> 4
    o_odd = (3 * cst + rt + 7) >> 4
    return _interleave_sublanes(o_even, o_odd).T          # [2CH, 2CW]


def _tail_kernel(y_ref, cb_ref, cr_ref, out_ref, *,
                 oy: int, ox: int, rh: int, rw: int,
                 ch_valid: int, cw_valid: int, ph: int, pw: int,
                 grp: int):
    i32 = jnp.int32
    row = lax.broadcasted_iota(i32, (ph, pw), 0)
    lane = lax.broadcasted_iota(i32, (ph, pw), 1)
    keep = (row < i32(rh)) & (lane < i32(rw))             # staging pad = 0
    # statically unrolled image loop: one grid program per tiny work
    # item loses (~5 us/launch; docs/performance.md)
    for g in range(grp):
        y = y_ref[g].astype(i32)                          # [LH, LW]
        ucb = _upsample_plane(cb_ref[g].astype(i32), ch_valid, cw_valid)
        ucr = _upsample_plane(cr_ref[g].astype(i32), ch_valid, cw_valid)

        lw = y.shape[1]

        def align(p):
            # crop alignment: rotate the x offset away (lane-offset
            # slices don't lower), 8-aligned sublane slice of PH rows
            p = pltpu.roll(p, lw - ox, 1) if ox else p
            return p[oy:oy + ph, :pw]

        ya = align(y)
        cba = align(ucb) - 128
        cra = align(ucr) - 128
        r = ya + ((i32(_FIX_1_40200) * cra + i32(_ONE_HALF))
                  >> _SCALEBITS)
        b = ya + ((i32(_FIX_1_77200) * cba + i32(_ONE_HALF))
                  >> _SCALEBITS)
        g_ = ya + ((i32(-_FIX_0_34414) * cba + i32(-_FIX_0_71414) * cra
                    + i32(_ONE_HALF)) >> _SCALEBITS)
        r = jnp.clip(r, 0, 255)
        g_ = jnp.clip(g_, 0, 255)
        b = jnp.clip(b, 0, 255)
        packed = b | (g_ << 8) | (r << 16)
        out_ref[g] = jnp.where(keep, packed, i32(0))


def upsample_color_pack(y_u8: jnp.ndarray, cb_u8: jnp.ndarray,
                        cr_u8: jnp.ndarray, win: CoefWindow,
                        pad_hw: tuple, interpret: bool = False
                        ) -> jnp.ndarray:
    """y [B, LH, LW] u8, cb/cr [B, CH, CW] u8 (spatial planes from the
    IDCT stage) -> [B, PH, PW] packed-BGR i32 staging crops. Requires
    oy % 8 == 0 and oy + PH <= LH (the aligned-slice trick); callers
    gate on geometry and fall back to the XLA tail otherwise."""
    B, lh, lw = y_u8.shape
    ph, pw = pad_hw
    assert win.oy % 8 == 0 and win.oy + ph <= lh
    grp = GT
    pad = (-B) % grp
    if pad:
        z = functools.partial(jnp.pad, pad_width=((0, pad), (0, 0), (0, 0)))
        y_u8, cb_u8, cr_u8 = z(y_u8), z(cb_u8), z(cr_u8)
    Bp = B + pad
    kernel = functools.partial(
        _tail_kernel, oy=win.oy, ox=win.ox, rh=win.rh, rw=win.rw,
        ch_valid=win.ch_valid, cw_valid=win.cw_valid, ph=ph, pw=pw,
        grp=grp)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, ph, pw), jnp.int32),
            grid=(Bp // grp,),
            in_specs=[
                pl.BlockSpec((grp, lh, lw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp, lh // 2, lw // 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp, lh // 2, lw // 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((grp, ph, pw), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(y_u8, cb_u8, cr_u8)
    return out[:B]
