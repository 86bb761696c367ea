"""Prototype: JPEG back-half (dequant + ISLOW IDCT + h2v2 fancy upsample
+ YCbCr->BGR) in numpy, validated byte-exact against the native pixel
decoder over the corpus. This is the numerics oracle for the device
implementation in meterelf_tpu/ops/jpegdec.py.

Usage: python experiments/jpegdec_proto.py [N_FILES]
"""
import ctypes
import glob
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.io.native.build import ensure_built

# ---- ISLOW IDCT constants (jidctint.c, CONST_BITS=13) ----
F_0_298631336 = 2446
F_0_390180644 = 3196
F_0_541196100 = 4433
F_0_765366865 = 6270
F_0_899976223 = 7373
F_1_175875602 = 9633
F_1_501321110 = 12299
F_1_847759065 = 15137
F_1_961570560 = 16069
F_2_053119869 = 16819
F_2_562915447 = 20995
F_3_072711026 = 25172


def descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _idct_butterfly(d, shift):
    """d: list of 8 arrays (same shape) i32/i64. Returns 8 outputs,
    descaled by `shift` (11 for pass 1, 18 for pass 2)."""
    z2, z3 = d[2], d[6]
    z1 = (z2 + z3) * F_0_541196100
    tmp2 = z1 - z3 * F_1_847759065
    tmp3 = z1 + z2 * F_0_765366865
    z2, z3 = d[0], d[4]
    tmp0 = (z2 + z3) << 13
    tmp1 = (z2 - z3) << 13
    t10, t13 = tmp0 + tmp3, tmp0 - tmp3
    t11, t12 = tmp1 + tmp2, tmp1 - tmp2

    t0, t1, t2, t3 = d[7], d[5], d[3], d[1]
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * F_1_175875602
    t0 = t0 * F_0_298631336
    t1 = t1 * F_2_053119869
    t2 = t2 * F_3_072711026
    t3 = t3 * F_1_501321110
    z1 = -z1 * F_0_899976223
    z2 = -z2 * F_2_562915447
    z3 = -z3 * F_1_961570560 + z5
    z4 = -z4 * F_0_390180644 + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4

    return [descale(t10 + t3, shift), descale(t11 + t2, shift),
            descale(t12 + t1, shift), descale(t13 + t0, shift),
            descale(t13 - t0, shift), descale(t12 - t1, shift),
            descale(t11 - t2, shift), descale(t10 - t3, shift)]


def idct_islow(coef, qt):
    """coef [N, 8, 8] i16 natural order, qt [8, 8] -> samples [N, 8, 8]
    uint8 (level-shifted +128, clamped)."""
    d = (coef.astype(np.int32) * qt.astype(np.int32))
    # pass 1: columns. d[:, r, :] is row r across all 8 columns.
    cols = [d[:, r, :] for r in range(8)]
    ws = _idct_butterfly(cols, 11)          # ws[r] : [N, 8] (row r)
    # pass 2: rows. For each output row r, butterfly over its 8 cols.
    rows = [ws[r] for r in range(8)]        # rows[r][:, c]
    # need per-row: combine columns; transpose view: element [N] arrays
    out = np.empty(coef.shape, np.uint8)
    colsets = [[rows[r][:, c] for c in range(8)] for r in range(8)]
    for r in range(8):
        o = _idct_butterfly(colsets[r], 18)
        for c in range(8):
            out[:, r, c] = np.clip(o[c] + 128, 0, 255).astype(np.uint8)
    return out


def blocks_to_plane(sb, bh, bw):
    """sb [bh*bw, 8, 8] -> [bh*8, bw*8]."""
    return (sb.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8))


def upsample_h2v2_fancy(c, out_h, out_w, img_ch, img_cw):
    """c [ch, cw] uint8 chroma plane (block padded), upsampled 2x2 with
    libjpeg's triangle filter. img_ch/img_cw: the VALID downsampled
    dims (clamp bounds = image edges). Output [out_h, out_w]."""
    ci = c.astype(np.int32)
    oh2 = (out_h + 1) // 2
    rows = np.arange(oh2)
    up = np.maximum(rows - 1, 0)
    dn = np.minimum(rows + 1, img_ch - 1)
    # colsum for output row 2j uses near row above; 2j+1 near below
    cs_even = 3 * ci[rows] + ci[up]          # [oh2, cw]
    cs_odd = 3 * ci[rows] + ci[dn]
    cs = np.empty((oh2 * 2, c.shape[1]), np.int32)
    cs[0::2] = cs_even
    cs[1::2] = cs_odd
    cs = cs[:out_h]
    cols = np.arange((out_w + 1) // 2)
    lf = np.maximum(cols - 1, 0)
    rt = np.minimum(cols + 1, img_cw - 1)
    o_even = (3 * cs[:, cols] + cs[:, lf] + 8) >> 4
    o_odd = (3 * cs[:, cols] + cs[:, rt] + 7) >> 4
    out = np.empty((out_h, ((out_w + 1) // 2) * 2), np.int32)
    out[:, 0::2] = o_even
    out[:, 1::2] = o_odd
    return out[:, :out_w].astype(np.uint8)


SCALEBITS = 16
ONE_HALF = 1 << 15


def _fix(x):
    return int(x * (1 << SCALEBITS) + 0.5)


def ycc_to_bgr(y, cb, cr):
    yi = y.astype(np.int32)
    cbi = cb.astype(np.int32) - 128
    cri = cr.astype(np.int32) - 128
    r = yi + ((_fix(1.40200) * cri + ONE_HALF) >> SCALEBITS)
    b = yi + ((_fix(1.77200) * cbi + ONE_HALF) >> SCALEBITS)
    g = yi + ((-_fix(0.34414) * cbi - _fix(0.71414) * cri + ONE_HALF)
              >> SCALEBITS)
    out = np.stack([b, g, r], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def read_coefs(path, lbx0, lby0, lbw, lbh, exp_w=0, exp_h=0):
    lib = ctypes.CDLL(ensure_built())
    lib.mej_read_coefs_region_file.restype = ctypes.c_int
    coefY = np.empty((lbh * lbw, 8, 8), np.int16)
    coefCb = np.empty((lbh // 2 * (lbw // 2), 8, 8), np.int16)
    coefCr = np.empty_like(coefCb)
    qt = np.empty((3, 64), np.uint16)
    rc = lib.mej_read_coefs_region_file(
        path.encode(), lbx0, lby0, lbw, lbh, exp_w, exp_h,
        coefY.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        coefCb.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        coefCr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        qt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return rc, coefY, coefCb, coefCr, qt


def decode_backhalf(path, w, h):
    """Full-frame back-half decode from coefficients."""
    lbw = (w + 7) // 8
    lbh = (h + 7) // 8
    assert lbw % 2 == 0 and lbh % 2 == 0, "proto: full grid must be even"
    rc, cY, cCb, cCr, qt = read_coefs(path, 0, 0, lbw, lbh)
    if rc != 0:
        return rc, None
    sy = blocks_to_plane(idct_islow(cY, qt[0].reshape(8, 8)), lbh, lbw)
    scb = blocks_to_plane(idct_islow(cCb, qt[1].reshape(8, 8)),
                          lbh // 2, lbw // 2)
    scr = blocks_to_plane(idct_islow(cCr, qt[2].reshape(8, 8)),
                          lbh // 2, lbw // 2)
    img_ch, img_cw = (h + 1) // 2, (w + 1) // 2
    ucb = upsample_h2v2_fancy(scb, h, w, img_ch, img_cw)
    ucr = upsample_h2v2_fancy(scr, h, w, img_ch, img_cw)
    return 0, ycc_to_bgr(sy[:h, :w], ucb, ucr)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    files = sorted(glob.glob("/root/reference/sample-images1/*.jpg"))[:n]
    files += sorted(glob.glob("/root/reference/sample-images2/*.jpg"))[:n]
    bad = 0
    for fn in files:
        ref = jio.decode_file(fn)
        h, w = ref.shape[:2]
        rc, out = decode_backhalf(fn, w, h)
        if rc != 0:
            print(f"{fn}: coef read rc={rc}")
            bad += 1
            continue
        eq = np.array_equal(out, ref)
        nd = 0 if eq else int((out != ref).sum())
        print(f"{fn.split('/')[-1]}: {'EXACT' if eq else f'{nd} diffs'}")
        if not eq:
            bad += 1
            ys, xs, cs = np.where(out != ref)
            print("  first diffs:", [(int(ys[i]), int(xs[i]), int(cs[i]),
                                      int(out[ys[i], xs[i], cs[i]]),
                                      int(ref[ys[i], xs[i], cs[i]]))
                                     for i in range(min(5, len(ys)))])
    print("FAIL" if bad else "ALL EXACT")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
