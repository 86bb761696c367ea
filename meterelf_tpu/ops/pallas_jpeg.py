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

import numpy as np

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
    padding whose outputs the caller discards).

    Runs the HORIZONTAL stage first on the transposed plane: the
    9/3/3/1 taps sum identically in either order (integer products,
    one final rounding add + shift), but horizontal-first transposes
    [CH, CW] + [CH, 2CW] instead of [2CH, CW] + [2CW, 2CH] — half the
    in-kernel transpose traffic, which dominated this stage's cost.
    The +8/+7 rounding pair follows the OUTPUT COLUMN parity
    (jdsample.c h2v2_fancy_upsample), which after the transpose back is
    the lane parity of the final stage."""
    i32 = jnp.int32
    ch, cw = c.shape
    ct = c.T                                              # [CW, CH]
    srow = lax.broadcasted_iota(i32, (cw, ch), 0)
    lf = jnp.where(srow == 0, ct, pltpu.roll(ct, 1, 0))
    rt = jnp.where(srow == i32(cw_valid - 1), ct,
                   pltpu.roll(ct, cw - 1, 0))
    hs = _interleave_sublanes(3 * ct + lf, 3 * ct + rt)   # [2CW, CH]
    hst = hs.T                                            # [CH, 2CW]
    row = lax.broadcasted_iota(i32, (ch, 2 * cw), 0)
    up = jnp.where(row == 0, hst, pltpu.roll(hst, 1, 0))
    dn = jnp.where(row == i32(ch_valid - 1), hst,
                   pltpu.roll(hst, ch - 1, 0))
    lane = lax.broadcasted_iota(i32, (ch, 2 * cw), 1)
    rnd = jnp.where((lane & 1) == 0, i32(8), i32(7))
    o_even = (3 * hst + up + rnd) >> 4
    o_odd = (3 * hst + dn + rnd) >> 4
    return _interleave_sublanes(o_even, o_odd)            # [2CH, 2CW]


def _color_pack_aligned(y, ucb, ucr, keep, *, oy: int, ox: int,
                        ph: int, pw: int):
    """Shared tail epilogue on in-VMEM i32 planes: crop-align (rotate
    the x offset away — lane-offset slices don't lower — then an
    8-aligned sublane slice when the geometry allows, else a sublane
    roll whose wrapped-in rows land past the crop and are zeroed by
    ``keep``), fixed-point YCbCr->BGR, pack, pad-zero.

    The roll path (round-4 generalization) lifts the oy % 8 == 0 and
    oy + ph <= lh gates: content row oy rotates to row 0, and any
    staging rows past the window (ph > lh) are zero-filled by concat.
    Wrapped garbage rows sit at sublanes >= lh - oy >= rh (the crop is
    inside the window), which ``keep`` masks to the staging zero."""
    i32 = jnp.int32
    lh, lw = y.shape

    def align(p):
        p = pltpu.roll(p, lw - ox, 1) if ox else p
        if oy % 8 == 0 and oy + ph <= lh:
            return p[oy:oy + ph, :pw]
        p = pltpu.roll(p, lh - oy, 0) if oy else p
        if ph > lh:
            p = jnp.concatenate(
                [p, jnp.zeros((ph - lh, lw), p.dtype)], axis=0)
        return p[0:ph, :pw]

    ya = align(y)
    cba = align(ucb) - 128
    cra = align(ucr) - 128
    r = ya + ((i32(_FIX_1_40200) * cra + i32(_ONE_HALF)) >> _SCALEBITS)
    b = ya + ((i32(_FIX_1_77200) * cba + i32(_ONE_HALF)) >> _SCALEBITS)
    g_ = ya + ((i32(-_FIX_0_34414) * cba + i32(-_FIX_0_71414) * cra
                + i32(_ONE_HALF)) >> _SCALEBITS)
    r = jnp.clip(r, 0, 255)
    g_ = jnp.clip(g_, 0, 255)
    b = jnp.clip(b, 0, 255)
    packed = b | (g_ << 8) | (r << 16)
    return jnp.where(keep, packed, i32(0))


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
        out_ref[g] = _color_pack_aligned(
            y, ucb, ucr, keep, oy=oy, ox=ox, ph=ph, pw=pw)


# ---------- fully fused back-half: dequant + IDCT + tail ----------
#
# The IDCT runs ON THE MXU, exactly. Each ISLOW pass is the integer
# linear map _IDCT_MAT applied within every 8-row (pass 1) / 8-lane
# (pass 2) group of the FREQUENCY-PLANE coefficient layout the C reader
# ships (io/native plane mode): pass 1 left-multiplies by I (x) M,
# pass 2 right-multiplies by I (x) M^T. i32 ring exactness on the
# int8-only MXU comes from base-256 SIGNED-DIGIT limb decomposition:
# x = x0 + 256*x1 + 65536*x2 (digits in [-128, 127]) covers |x| <= 2^23
# (dequantized coefficients: |coef| <= 32767, 8-bit tables <= 255, so
# |coef*qt| < 2^23; pass-2 inputs are descale-11 outputs, |ws| <= 2^21),
# the matrix (|M| <= 11363) needs two digits, and every cross term
# 256^(i+j) * (xi . mj) with i+j <= 3 is an exact i32 dot — the MXU
# accumulates int8 products exactly — shifted into place with wrapping
# i32 adds. Sums and shifts wrap mod 2^32 exactly like the C butterfly
# (jidctint.c), so the result is bit-identical to ops/jpegdec.py's XLA
# path for EVERY representable input, adversarial coefficients
# included. No coefficient transpose, no plane intermediate, no HBM
# traffic between IDCT and upsample/color/pack.


def _limb_split_i32(x):
    """i32 [S, L] -> three int8 signed base-256 digits (|x| < 2^23)."""
    l0 = ((x + 128) & 255) - 128
    x1 = (x - l0) >> 8
    l1 = ((x1 + 128) & 255) - 128
    l2 = (x1 - l1) >> 8
    return (l0.astype(jnp.int8), l1.astype(jnp.int8),
            l2.astype(jnp.int8))


def _limb_matmul(x_i32, a_lo, a_hi, left: bool):
    """Exact-mod-2^32 integer matmul of x (i32, |x| < 2^23) with a
    2-digit int8 constant matrix. left=True: A @ x, else x @ A."""
    i32 = jnp.int32
    terms = {}
    for i, xi in enumerate(_limb_split_i32(x_i32)):
        for j, aj in enumerate((a_lo, a_hi)):
            if left:
                p = lax.dot_general(aj, xi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=i32)
            else:
                p = lax.dot_general(xi, aj, (((1,), (0,)), ((), ())),
                                    preferred_element_type=i32)
            sh = 8 * (i + j)
            terms[sh] = p if sh not in terms else terms[sh] + p
    acc = terms[0]
    for sh in sorted(terms):
        if sh:
            acc = acc + (terms[sh] << sh)
    return acc


def _descale(x, n: int):
    return (x + (1 << (n - 1))) >> n


def _band_limbs(nblocks: int):
    """(lo, hi) int8 limb pair of I_nblocks (x) _IDCT_MAT."""
    from .jpegdec import _IDCT_MAT
    m = np.kron(np.eye(nblocks, dtype=np.int64),
                _IDCT_MAT.astype(np.int64))
    lo = ((m + 128) % 256) - 128
    hi = (m - lo) >> 8
    assert hi.min() >= -128 and hi.max() <= 127
    return lo.astype(np.int8), hi.astype(np.int8)


def _tile_qt(q8, rows: int, lanes: int):
    """[8, L0] i32 quant pattern -> [rows, lanes] tile (8x8 periodic;
    the input is already lane-tiled to L0=128 by the caller; lanes must
    be a multiple of L0 — guaranteed by the lw % 128 == 0 gate)."""
    t = jnp.concatenate([q8] * (rows // 8), axis=0)
    l0 = t.shape[1]
    if lanes > l0:
        t = jnp.concatenate([t] * (lanes // l0), axis=1)
    return t[:, :lanes]


def _unpack_compact(arr_i8) -> jnp.ndarray:
    """Compact wire plane [R*3/2, L] i8 -> [R, L] i32 coefficients,
    in-kernel (ops/jpegdec.uncompact_plane semantics: lo rows then
    row-pair hi nibbles).

    Converts to i32 first so the row slices land on 8-sublane tiles,
    then interleaves the pre-selected nibbles with the stack+reshape
    sublane interleave — no parity select needed. (A bitcast-based
    byte-stream split with a 3-level re-interleave measured SLOWER:
    40.8k vs 45.4k back-half img/s — the interleave cascade costs more
    than Mosaic's i8->i32 expansion relayout.)"""
    i32 = jnp.int32
    a = arr_i8.astype(i32)
    R = a.shape[0] * 2 // 3
    lo = a[0:R, :] & i32(255)
    hi8 = a[R:, :] & i32(255)                   # [R//2, L]
    hv = _interleave_sublanes(hi8 & i32(15), (hi8 >> 4) & i32(15))
    v = (hv << 8) | lo
    return (v << 20) >> 20


def _fused_kernel(fy_ref, fcb_ref, fcr_ref, qt_ref,
                  a1y_lo_ref, a1y_hi_ref, a1c_lo_ref, a1c_hi_ref,
                  b_lo_ref, b_hi_ref, out_ref, *,
                  oy: int, ox: int, rh: int, rw: int,
                  ch_valid: int, cw_valid: int, ph: int, pw: int,
                  grp: int, compact: bool = False):
    i32 = jnp.int32
    row = lax.broadcasted_iota(i32, (ph, pw), 0)
    lane = lax.broadcasted_iota(i32, (ph, pw), 1)
    keep = (row < i32(rh)) & (lane < i32(rw))
    a1y = (a1y_lo_ref[...], a1y_hi_ref[...])
    a1c = (a1c_lo_ref[...], a1c_hi_ref[...])
    bmat = (b_lo_ref[...], b_hi_ref[...])
    for g in range(grp):
        if compact:
            fyg = _unpack_compact(fy_ref[g])
            fcg = jnp.concatenate(
                [_unpack_compact(fcb_ref[g]),
                 _unpack_compact(fcr_ref[g])], axis=1)
            lh, lw = fyg.shape
            ch, cw = fyg.shape[0] // 2, fcb_ref.shape[2]
        else:
            fyg = fy_ref[g].astype(i32)
            fcg = jnp.concatenate([fcb_ref[g], fcr_ref[g]],
                                  axis=1).astype(i32)
            lh, lw = fy_ref.shape[1:]
            ch, cw = fcb_ref.shape[1:]
        qt = qt_ref[g].astype(i32)                        # [24, 128]
        qy = _tile_qt(qt[0:8], lh, lw)
        qc = jnp.concatenate([_tile_qt(qt[8:16], ch, cw),
                              _tile_qt(qt[16:24], ch, cw)], axis=1)
        fy = fyg * qy                                     # dequant
        fc = fcg * qc                                     # [CH, 2CW]
        ws_y = _descale(_limb_matmul(fy, *a1y, left=True), 11)
        ws_c = _descale(_limb_matmul(fc, *a1c, left=True), 11)
        ws = jnp.concatenate([ws_y, ws_c], axis=0)        # [LH+CH, LW]
        px = jnp.clip(
            _descale(_limb_matmul(ws, *bmat, left=False), 18) + 128,
            0, 255)
        y = px[0:lh]
        ucb = _upsample_plane(px[lh:lh + ch, 0:cw], ch_valid, cw_valid)
        ucr = _upsample_plane(px[lh:lh + ch, cw:2 * cw],
                              ch_valid, cw_valid)
        out_ref[g] = _color_pack_aligned(
            y, ucb, ucr, keep, oy=oy, ox=ox, ph=ph, pw=pw)


def _lane_target(lw: int, pw: int) -> int:
    """Padded luma lane width for the tail kernels: a 256-multiple (so
    the chroma half-width is itself 128-aligned — the cb|cr lane concat
    and the shared pass-2 IDCT matmul need vreg-aligned halves) covering
    both the decoded window and the staging output."""
    return -(-max(lw, pw) // 256) * 256


def _pad_lanes(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """Zero-pad the lane (last) axis of [B, S, L] to ``target``."""
    if x.shape[2] == target:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, target - x.shape[2])))


def fused_backhalf_planes(fy: jnp.ndarray, fcb: jnp.ndarray,
                          fcr: jnp.ndarray, qt: jnp.ndarray,
                          win: CoefWindow, pad_hw: tuple,
                          interpret: bool = False) -> jnp.ndarray:
    """Frequency-plane coefficients (io.jpeg read_coefs_batch
    plane_layout=True: fy [B, lbh*8, lbw*8] i16, fcb/fcr
    [B, lbh*4, lbw*4] i16, qt [B, 3, 64]) -> [B, PH, PW] packed-BGR i32
    staging crops, bit-identical to jpegdec.backhalf_to_packed.

    Geometry (round-4 generalization): any chroma-block window works —
    planes are zero-lane-padded in XLA to a 256-multiple (padded blocks
    IDCT to flat gray and are cropped away), and non-8-aligned crop rows
    / staging pads taller than the window ride the roll+zero-fill path
    in _color_pack_aligned. The former oy/lw alignment gates (which
    excluded the second shipped camera, oy=14 lw=240) are gone; callers
    still gate on jpegdec.fused_tail_ok for platform + size."""
    compact = fy.dtype == jnp.int8      # 12-bit wire (io/jpeg compact)
    B, lh, lw = fy.shape
    if compact:
        lh = lh * 2 // 3                # true plane rows
    ph, pw = pad_hw
    L = _lane_target(lw, pw)
    fy = _pad_lanes(fy, L)
    fcb = _pad_lanes(fcb, L // 2)
    fcr = _pad_lanes(fcr, L // 2)
    ch, cw = fcb.shape[1:]
    if compact:
        ch = ch * 2 // 3
    if not (win.oy + win.rh <= lh and win.ox + win.rw <= lw):
        raise ValueError(
            f"crop exceeds the decoded window (win={win}); the "
            "coefficient feed and pad_hw are inconsistent")
    # quant tables lane-tiled to 128 once in XLA (12 KB/image)
    qt8 = qt.astype(jnp.int32).reshape(B, 3, 8, 8)
    qt_t = jnp.tile(qt8, (1, 1, 1, 16)).reshape(B, 24, 128)
    a1y = _band_limbs(lh // 8)
    a1c = _band_limbs(ch // 8)
    bl, bh_ = _band_limbs(L // 8)           # pass 2 acts on padded lanes
    bmat = (bl.T.copy(), bh_.T.copy())      # I (x) M^T, limb-wise
    grp = GT
    pad = (-B) % grp
    if pad:
        z = functools.partial(jnp.pad, pad_width=((0, pad), (0, 0), (0, 0)))
        fy, fcb, fcr = z(fy), z(fcb), z(fcr)
        qt_t = jnp.pad(qt_t, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    kernel = functools.partial(
        _fused_kernel, oy=win.oy, ox=win.ox, rh=win.rh, rw=win.rw,
        ch_valid=win.ch_valid, cw_valid=win.cw_valid, ph=ph, pw=pw,
        grp=grp, compact=compact)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, ph, pw), jnp.int32),
            grid=(Bp // grp,),
            in_specs=[
                pl.BlockSpec((grp,) + tuple(fy.shape[1:]),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp,) + tuple(fcb.shape[1:]),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp,) + tuple(fcr.shape[1:]),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp, 24, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [const_spec] * 6,
            out_specs=pl.BlockSpec((grp, ph, pw), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(fy, fcb, fcr, qt_t,
          jnp.asarray(a1y[0]), jnp.asarray(a1y[1]),
          jnp.asarray(a1c[0]), jnp.asarray(a1c[1]),
          jnp.asarray(bmat[0]), jnp.asarray(bmat[1]))
    return out[:B]


def upsample_color_pack(y_u8: jnp.ndarray, cb_u8: jnp.ndarray,
                        cr_u8: jnp.ndarray, win: CoefWindow,
                        pad_hw: tuple, interpret: bool = False
                        ) -> jnp.ndarray:
    """y [B, LH, LW] u8, cb/cr [B, CH, CW] u8 (spatial planes from the
    IDCT stage) -> [B, PH, PW] packed-BGR i32 staging crops. Any window
    geometry (round-4 generalization, same scheme as
    fused_backhalf_planes: XLA zero-lane-pad to a 256-multiple +
    roll/zero-fill crop alignment in _color_pack_aligned); callers gate
    on jpegdec._pallas_tail_ok for platform + size."""
    B, lh, lw = y_u8.shape
    ph, pw = pad_hw
    if not (win.oy + win.rh <= lh and win.ox + win.rw <= lw):
        raise ValueError(
            f"crop exceeds the decoded window (win={win}); the "
            "plane feed and pad_hw are inconsistent")
    L = _lane_target(lw, pw)
    y_u8 = _pad_lanes(y_u8, L)
    cb_u8 = _pad_lanes(cb_u8, L // 2)
    cr_u8 = _pad_lanes(cr_u8, L // 2)
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
                pl.BlockSpec((grp, lh, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp, lh // 2, L // 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((grp, lh // 2, L // 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((grp, ph, pw), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(y_u8, cb_u8, cr_u8)
    return out[:B]
