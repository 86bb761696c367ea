"""Fused Pallas window-mask kernel: dial-cluster superwindow in,
per-dial needle-mask bits out.

Replaces the XLA window stage of pipeline/decode.py (static window
slices + exact HLS + 5x5 color sample + inRange + 3x3 close): all four
64x64 dial windows are laid side by side in one [64, 256] "quad" so
every op runs at full 128-lane width (the XLA stage's [.., 64, 64]
arrays leave half of every vector register empty; measured ~2.9 ms ->
~1.3 ms per 512-batch).

Exact-HLS note: the reference's H/S channels need IEEE-correctly-
rounded f32 division (ops/color.py); Mosaic cannot lower the f64
emulation XLA uses, so this kernel divides with a Dekker two-product
Newton correction — q0 = a/b (TPU approximate), r = a - q0*b computed
EXACTLY via Veltkamp splitting, q = q0 + r/b. Verified to reproduce the
f64-emulated path's u8 HLS output for ALL 2^24 BGR inputs
(tests/test_ops.py::test_dekker_division_exact samples; the exhaustive
sweep ran on v5e 2026-08-17, 0/16777216 mismatches).

Output: per image a [64, 256] i32 quad of packed bits
    bit 0: masked  (closed & dial disk)
    bit 1: disk    (static dial disk mask)
    bit 2: closed  (3x3-closed inRange mask)
— exactly the planes ops/pallas_ccl.propagate_quads and
components._finalize consume. Reference: meterelf/_reading.py:118-151.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 64          # dial window size
QUAD_W = 256    # 4 windows side by side
SW_H = 136      # superwindow geometry (ops/pallas_frontend.py)
SW_W = 256

_F = jnp.float32
_SPLIT = 4097.0  # 2^12 + 1 (Veltkamp)


def _two_prod(x, y):
    """x*y = p + e exactly (Dekker two-product, no FMA needed)."""
    p = x * y
    xc = _F(_SPLIT) * x
    xh = xc - (xc - x)
    xl = x - xh
    yc = _F(_SPLIT) * y
    yh = yc - (yc - y)
    yl = y - yh
    e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    return p, e


def _div_exact(a, b, *, div_impl="dekker"):
    """IEEE-correctly-rounded f32 a/b.

    div_impl="dekker" (compiled TPU): the approximate VPU divide gets
    one exact-residual Dekker correction — verified to reproduce the
    f64 path's u8 HLS for ALL 2^24 BGR inputs on v5e.
    div_impl="f64" (interpret mode): the same f64-emulated division the
    XLA reference path uses (ops/color._exact_f32_div), so interpret
    output is bit-identical to the XLA window stage by construction
    (the CPU backend's --xla_allow_excess_precision makes pure-f32
    formulations evaluate in excess precision there, corrupting both
    the native and the Dekker variants)."""
    if div_impl == "f64":
        return (a.astype(jnp.float64) / b.astype(jnp.float64)).astype(_F)
    q0 = a / b
    p, e = _two_prod(q0, b)
    r = (a - p) - e
    return q0 + r / b


def _hls_planes(b_f, g_f, r_f, hue_shift, *, div_impl="dekker"):
    """Exact cv2 float-path BGR->HLS_FULL on f32 planes (the in-kernel
    twin of ops/color.bgr_planes_to_hls; i32 outputs)."""
    import functools as _ft
    _div = _ft.partial(_div_exact, div_impl=div_impl)
    i32 = jnp.int32
    scale = _F(1.0) / _F(255.0)
    b = b_f * scale
    g = g_f * scale
    r = r_f * scale
    vmax = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    l = (vmax + vmin) * _F(0.5)
    diff = vmax - vmin
    nonzero = vmax != vmin
    safe = jnp.where(nonzero, diff, _F(1.0))
    s = jnp.where(
        l < _F(0.5),
        _div(diff, vmax + vmin),
        _div(diff, _F(2.0) - vmax - vmin),
    )
    diff60 = _div(jnp.full_like(safe, 60.0), safe)
    h = jnp.where(
        vmax == r,
        (g - b) * diff60,
        jnp.where(vmax == g, (b - r) * diff60 + _F(120.0),
                  (r - g) * diff60 + _F(240.0)),
    )
    h = jnp.where(h < _F(0.0), h + _F(360.0), h)
    h = jnp.where(nonzero, h, _F(0.0))
    s = jnp.where(nonzero, s, _F(0.0))

    def sat(x):
        return jnp.clip(jnp.round(x), _F(0.0), _F(255.0)).astype(i32)

    hscale = _F(256.0) / _F(360.0)
    h_u8 = (sat(h * hscale) + i32(hue_shift)) % i32(256)
    l_u8 = sat(l * _F(255.0))
    s_u8 = sat(s * _F(255.0))
    return h_u8, l_u8, s_u8


def _close3_blocked(raw_i, lane):
    """3x3 binary close on the quad: dilate (max) then erode (min) with
    64-block lane seams (out-of-window neighbors read as 0 for dilate,
    1 for erode; row borders likewise)."""
    i32 = jnp.int32

    def nbr(x, fill):
        # rows: plain shifts with border fill via iota masks
        sub = lax.broadcasted_iota(i32, x.shape, 0)
        u = jnp.where(sub < i32(W - 1), pltpu.roll(x, x.shape[0] - 1, 0), fill)
        d = jnp.where(sub >= i32(1), pltpu.roll(x, 1, 0), fill)
        lm = lane % i32(W)
        lf = jnp.where(lm < i32(W - 1), pltpu.roll(x, x.shape[1] - 1, 1), fill)
        rt = jnp.where(lm >= i32(1), pltpu.roll(x, 1, 1), fill)
        return u, d, lf, rt

    def dilate(x):
        u, d, lf, rt = nbr(x, i32(0))
        m = jnp.maximum(jnp.maximum(x, jnp.maximum(u, d)),
                        jnp.maximum(lf, rt))
        # diagonals: combine row-shift of the lane-shifted values
        sub = lax.broadcasted_iota(i32, x.shape, 0)
        h = jnp.maximum(lf, rt)
        du = jnp.where(sub < i32(W - 1), pltpu.roll(h, x.shape[0] - 1, 0),
                       i32(0))
        dd = jnp.where(sub >= i32(1), pltpu.roll(h, 1, 0), i32(0))
        return jnp.maximum(m, jnp.maximum(du, dd))

    def erode(x):
        u, d, lf, rt = nbr(x, i32(1))
        m = jnp.minimum(jnp.minimum(x, jnp.minimum(u, d)),
                        jnp.minimum(lf, rt))
        sub = lax.broadcasted_iota(i32, x.shape, 0)
        h = jnp.minimum(lf, rt)
        du = jnp.where(sub < i32(W - 1), pltpu.roll(h, x.shape[0] - 1, 0),
                       i32(1))
        dd = jnp.where(sub >= i32(1), pltpu.roll(h, 1, 0), i32(1))
        return jnp.minimum(m, jnp.minimum(du, dd))

    return erode(dilate(raw_i))


def _windows_kernel(sw_ref, disk_ref, cr_ref, hs_ref, bits_ref, *,
                    origins, centers, div_impl="dekker"):
    """sw_ref: [SW_H, SW_W] i32 packed-BGR superwindow.
    disk_ref: [W, QUAD_W] i32 static disk quad. cr_ref: [8, 128] i32
    color ranges (row d, lanes 0..2 = h/l/s). hs_ref: [1] i32 SMEM hue
    shift. bits_ref: [W, QUAD_W] i32 output quad."""
    bits_ref[...] = bits_from_sw(
        sw_ref[...], disk_ref[...], cr_ref, hs_ref[0],
        origins=origins, centers=centers, div_impl=div_impl)


def bits_from_sw(sw: jnp.ndarray, disk: jnp.ndarray,
                 cr_ref: jnp.ndarray, hs: jnp.ndarray,
                 *, origins: tuple, centers: tuple,
                 div_impl: str = "dekker") -> jnp.ndarray:
    """Pure-value window-mask body: [SW_H, SW_W] i32 superwindow (value)
    -> [W, QUAD_W] i32 packed bits. Factored out of the kernel body so
    the merged frontend+windows kernel (ops/pallas_frontend.py, the
    METERELF_FRONTEND=merged path) reuses it directly."""
    i32 = jnp.int32

    # assemble the quad: 4 window slices side by side. Each window is
    # rotated to origin first (static rolls) so every slice and the
    # concat are register-aligned (Mosaic rejects concats of lane-offset
    # slices: "offset mismatch on non-concat dimension").
    parts = []
    for d, (ox, oy) in enumerate(origins):
        al = pltpu.roll(pltpu.roll(sw, SW_H - oy, 0), SW_W - ox, 1)
        parts.append(al[0:W, 0:W])
    quad = jnp.concatenate(parts, axis=1)          # [W, QUAD_W] i32

    b = (quad & i32(255)).astype(_F)
    g = ((quad >> 8) & i32(255)).astype(_F)
    r = ((quad >> 16) & i32(255)).astype(_F)
    h, l, s = _hls_planes(b, g, r, hs, div_impl=div_impl)

    lane = lax.broadcasted_iota(i32, (W, QUAD_W), 1)

    # per-dial 5x5 color sample -> integer-exact rounded mean -> lo/hi
    lo_h = jnp.zeros((W, QUAD_W), i32)
    hi_h = jnp.zeros((W, QUAD_W), i32)
    lo_l = jnp.zeros((W, QUAD_W), i32)
    hi_l = jnp.zeros((W, QUAD_W), i32)
    lo_s = jnp.zeros((W, QUAD_W), i32)
    hi_s = jnp.zeros((W, QUAD_W), i32)
    for d, (cx, cy) in enumerate(centers):
        x0 = d * W + cx - 2
        blk = lane // i32(W) == i32(d)
        for ci, plane in enumerate((h, l, s)):
            core = plane[cy - 2:cy + 3, x0:x0 + 5]
            # sum in f32: Mosaic's scalar-i32 reduce proxy re-traces
            # under the ambient x64 config and injects an i64 convert;
            # 25 values <= 255 are exact in f32, and the rounded-mean
            # quotient (2s+25)/50 is never within 5e-5 of an integer
            # (odd numerator), so the f32 floor is exact
            ssum = jnp.sum(core.astype(_F))
            dc = jnp.floor((_F(2.0) * ssum + _F(25.0))
                           * (_F(1.0) / _F(50.0))).astype(i32)
            crv = cr_ref[d, ci]
            lo = jnp.clip(dc - crv, i32(0), i32(255))
            hi = jnp.clip(dc + crv, i32(0), i32(255))
            if ci == 0:
                lo_h = jnp.where(blk, lo, lo_h)
                hi_h = jnp.where(blk, hi, hi_h)
            elif ci == 1:
                lo_l = jnp.where(blk, lo, lo_l)
                hi_l = jnp.where(blk, hi, hi_l)
            else:
                lo_s = jnp.where(blk, lo, lo_s)
                hi_s = jnp.where(blk, hi, hi_s)

    raw = ((h >= lo_h) & (h <= hi_h)
           & (l >= lo_l) & (l <= hi_l)
           & (s >= lo_s) & (s <= hi_s)).astype(i32)
    closed = _close3_blocked(raw, lane)
    masked = closed & disk
    return (masked | (disk << 1) | (closed << 2)
            | (raw << 3))  # bit 3: pre-close raw (debug)


def window_bits_quads(
    superwindows: jnp.ndarray,   # [B, SW_H, SW_W] i32 packed BGR
    disk_quad: jnp.ndarray,      # [W, QUAD_W] i32 (0/1)
    color_range: jnp.ndarray,    # [D<=8, 3] i32
    hue_shift: int,
    origins: tuple,              # ((ox, oy) per dial), python ints
    centers: tuple,              # ((cx, cy) per dial), python ints
    interpret: bool = False,
) -> jnp.ndarray:
    """-> [B, W, QUAD_W] i32 packed mask bits (see module docstring)."""
    B = superwindows.shape[0]
    assert superwindows.shape[1:] == (SW_H, SW_W)
    D = len(origins)
    assert D * W == QUAD_W, "quad kernel is specialized to 4 dials"

    cr = jnp.zeros((8, 128), jnp.int32)
    cr = cr.at[:D, :3].set(color_range.astype(jnp.int32))
    hs = jnp.asarray(hue_shift, jnp.int32).reshape(1)

    import functools
    kernel = functools.partial(
        _windows_kernel,
        origins=tuple((int(x), int(y)) for x, y in origins),
        centers=tuple((int(x), int(y)) for x, y in centers),
        div_impl="f64" if interpret else "dekker")

    import contextlib
    ctx = (contextlib.nullcontext() if interpret    # f64 div needs x64
           else jax.enable_x64(False))
    with ctx:
        bits = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * W, QUAD_W), jnp.int32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((SW_H, SW_W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, QUAD_W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((W, QUAD_W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(superwindows.reshape(B * SW_H, SW_W), disk_quad, cr, hs)
    return bits.reshape(B, W, QUAD_W)
