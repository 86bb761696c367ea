"""Oracle-driven development of a bit-exact replica of OpenCV's f32 DFT.

Goal: reproduce cv2.matchTemplate(TM_CCOEFF) max_val without cv2 at
runtime (the two golden-pinned corrupt-frame strings). cv2.dft is the
development oracle; the shipped implementation must match it bit-exactly
on f32 inputs.

Run: python experiments/cvdft_dev.py
"""
import numpy as np
import cv2

cv2.ipp.setUseIPP(False)  # the plain C++ path is the golden one
F = np.float32


# ---------------------------------------------------------------------------
# factorization + permutation + wave table (OpenCV DFTFactorize/DFTInit)
# ---------------------------------------------------------------------------

def factorize(n):
    """OpenCV DFTFactorize: the power-of-two part as ONE leading factor,
    then odd factors in descending order."""
    factors = []
    f = 1
    while n % 2 == 0:
        f *= 2
        n //= 2
    if f > 1:
        factors.append(f)
    d = 3
    odd = []
    while n > 1:
        while n % d == 0:
            odd.append(d)
            n //= d
        d += 2
    # odd factors DESCENDING after the pow2 part (empirical: matches
    # cv2's plain-path rounding on mixed sizes like 15/30/45/135)
    factors.extend(sorted(odd, reverse=True))
    return factors


def dft_init(n, factors, inv=False):
    """-> (itab, wave_re, wave_im) like OpenCV DFTInit.

    wave accumulated in double via complex multiplication by
    w1 = exp(+-2*pi*i/n), stored to f32; symmetric upper half is the
    conjugate of the lower half.
    """
    nf = len(factors)
    # --- permutation table ---
    # q decomposes little-endian over the factor bases (d0 = q % f0, ...);
    # itab[q] = sum_i rev(d_i) * (n / prod_{j<=i} f_j), with bit-reversal
    # applied only to the leading power-of-two digit. (Derived empirically
    # against cv2.dft impulse columns; matches bit reversal for pure 2^k
    # and identity for a single odd factor.)
    if factors and factors[0] & 1 == 0:
        m = factors[0].bit_length() - 1

        def rev0(d):
            return int(f"{d:0{m}b}"[::-1], 2) if m else 0
    else:
        def rev0(d):
            return d
    itab = np.zeros(n, np.int64)
    for q in range(n):
        rem = q
        stride = n
        val = 0
        for fi, fct in enumerate(factors):
            d = rem % fct
            rem //= fct
            if fi == 0:
                d = rev0(d)
            stride //= fct
            val += d * stride
        itab[q] = val
    # --- wave table ---
    wave_re = np.zeros(n, np.float64)
    wave_im = np.zeros(n, np.float64)
    import math
    t = -(math.pi * 2 / n)
    if inv:
        t = -t
    w1 = complex(math.cos(t), math.sin(t))
    wave_re[0] = 1.0
    wave_im[0] = 0.0
    if n % 2 == 0:
        wave_re[n // 2] = -1.0
        wave_im[n // 2] = 0.0
    for i in range(1, (n + 1) // 2):
        wr = math.cos(t * i)
        wi = math.sin(t * i)
        wave_re[i] = wr
        wave_im[i] = wi
        wave_re[n - i] = wr
        wave_im[n - i] = -wi
    return itab, wave_re.astype(F), wave_im.astype(F)


# ---------------------------------------------------------------------------
# complex DFT, vectorized over a leading batch axis, f32 exact stepping
# ---------------------------------------------------------------------------

def cv_cdft(re, im, inv=False):
    """Complex DFT of each row of (re, im) [B, n] f32, OpenCV dataflow."""
    re = np.ascontiguousarray(re, F)
    im = np.ascontiguousarray(im, F)
    B, n = re.shape
    factors = factorize(n)
    itab, wre, wim = dft_init(n, factors)
    # 0. shuffle; the inverse is bitwise conj(dft(conj(x))) in cv2's
    # plain path (verified empirically), so it shares the forward tables
    dre = re[:, itab].copy()
    dim = (-im[:, itab]).copy() if inv else im[:, itab].copy()

    cur = 1  # current transform size
    fstart = 0
    if factors[0] & 1 == 0:
        # radix-4 stages then one radix-2
        f0 = factors[0]
        dw0 = n  # wave stride starts at n, divided per stage
        # OpenCV: dw0 = tab_size (=n); each stage divides
        while cur * 4 <= f0:
            nx = cur
            cur *= 4
            dw0 //= 4
            for i in range(0, n, cur):
                v0 = i
                v1 = i + nx * 2
                # j = 0 butterfly (twiddle-free)
                r0 = dre[:, v1].copy(); i0 = dim[:, v1].copy()
                r4 = dre[:, v1 + nx].copy(); i4 = dim[:, v1 + nx].copy()
                r1 = r0 + r4; i1 = i0 + i4
                r3 = i0 - i4; i3 = r4 - r0
                r2 = dre[:, v0].copy(); i2 = dim[:, v0].copy()
                r4 = dre[:, v0 + nx].copy(); i4 = dim[:, v0 + nx].copy()
                r0 = r2 + r4; i0 = i2 + i4
                r2 = r2 - r4; i2 = i2 - i4
                dre[:, v0] = r0 + r1; dim[:, v0] = i0 + i1
                dre[:, v1] = r0 - r1; dim[:, v1] = i0 - i1
                dre[:, v0 + nx] = r2 + r3; dim[:, v0 + nx] = i2 + i3
                dre[:, v1 + nx] = r2 - r3; dim[:, v1 + nx] = i2 - i3
                for j in range(1, nx):
                    dw = dw0 * j
                    v0 = i + j
                    v1 = v0 + nx * 2
                    r2 = dre[:, v0 + nx].copy() * wre[dw * 2] - dim[:, v0 + nx].copy() * wim[dw * 2]
                    i2 = dre[:, v0 + nx].copy() * wim[dw * 2] + dim[:, v0 + nx].copy() * wre[dw * 2]
                    r0 = dre[:, v1].copy() * wim[dw] + dim[:, v1].copy() * wre[dw]
                    i0 = dre[:, v1].copy() * wre[dw] - dim[:, v1].copy() * wim[dw]
                    r3 = dre[:, v1 + nx].copy() * wim[dw * 3] + dim[:, v1 + nx].copy() * wre[dw * 3]
                    i3 = dre[:, v1 + nx].copy() * wre[dw * 3] - dim[:, v1 + nx].copy() * wim[dw * 3]
                    r1 = i0 + i3; i1 = r0 + r3
                    r3 = r0 - r3; i3 = i3 - i0
                    r4 = dre[:, v0].copy(); i4 = dim[:, v0].copy()
                    r0 = r4 + r2; i0 = i4 + i2
                    r2 = r4 - r2; i2 = i4 - i2
                    dre[:, v0] = r0 + r1; dim[:, v0] = i0 + i1
                    dre[:, v1] = r0 - r1; dim[:, v1] = i0 - i1
                    dre[:, v0 + nx] = r2 + r3; dim[:, v0 + nx] = i2 + i3
                    dre[:, v1 + nx] = r2 - r3; dim[:, v1 + nx] = i2 - i3
        while cur < f0:
            # remaining radix-2
            nx = cur
            cur *= 2
            dw0 //= 2
            for i in range(0, n, cur):
                v = i
                r0 = dre[:, v].copy() + dre[:, v + nx].copy()
                i0 = dim[:, v].copy() + dim[:, v + nx].copy()
                r1 = dre[:, v].copy() - dre[:, v + nx].copy()
                i1 = dim[:, v].copy() - dim[:, v + nx].copy()
                dre[:, v] = r0; dim[:, v] = i0
                dre[:, v + nx] = r1; dim[:, v + nx] = i1
                for j in range(1, nx):
                    dw = dw0 * j
                    v = i + j
                    r1 = dre[:, v + nx].copy() * wre[dw] - dim[:, v + nx].copy() * wim[dw]
                    i1 = dim[:, v + nx].copy() * wre[dw] + dre[:, v + nx].copy() * wim[dw]
                    r0 = dre[:, v].copy(); i0 = dim[:, v].copy()
                    dre[:, v] = r0 + r1; dim[:, v] = i0 + i1
                    dre[:, v + nx] = r0 - r1; dim[:, v + nx] = i0 - i1
        fstart = 1

    for f_idx in range(fstart, len(factors)):
        factor = factors[f_idx]
        nx = cur
        cur *= factor
        dw0 = n // cur
        if factor == 3:
            sin_120 = F(0.86602540378443864676372317075294)
            half = F(0.5)
            for i in range(0, n, cur):
                for j in range(nx):
                    dw = dw0 * j
                    v = i + j
                    if j == 0:
                        r1 = dre[:, v + nx].copy() + dre[:, v + nx * 2].copy()
                        i1 = dim[:, v + nx].copy() + dim[:, v + nx * 2].copy()
                        r0 = dre[:, v].copy(); i0 = dim[:, v].copy()
                        r2 = sin_120 * (dim[:, v + nx].copy() - dim[:, v + nx * 2].copy())
                        i2 = sin_120 * (dre[:, v + nx * 2].copy() - dre[:, v + nx].copy())
                        dre[:, v] = r0 + r1; dim[:, v] = i0 + i1
                        r0 = r0 - half * r1; i0 = i0 - half * i1
                        dre[:, v + nx] = r0 + r2; dim[:, v + nx] = i0 + i2
                        dre[:, v + nx * 2] = r0 - r2; dim[:, v + nx * 2] = i0 - i2
                    else:
                        r0 = dre[:, v + nx].copy() * wre[dw] - dim[:, v + nx].copy() * wim[dw]
                        i0 = dre[:, v + nx].copy() * wim[dw] + dim[:, v + nx].copy() * wre[dw]
                        i2 = dre[:, v + nx * 2].copy() * wre[dw * 2] - dim[:, v + nx * 2].copy() * wim[dw * 2]
                        r2 = dre[:, v + nx * 2].copy() * wim[dw * 2] + dim[:, v + nx * 2].copy() * wre[dw * 2]
                        r1 = r0 + i2; i1 = i0 + r2
                        r2 = sin_120 * (i0 - r2); i2 = sin_120 * (i2 - r0)
                        r0 = dre[:, v].copy(); i0 = dim[:, v].copy()
                        dre[:, v] = r0 + r1; dim[:, v] = i0 + i1
                        r0 = r0 - half * r1; i0 = i0 - half * i1
                        dre[:, v + nx] = r0 + r2; dim[:, v + nx] = i0 + i2
                        dre[:, v + nx * 2] = r0 - r2; dim[:, v + nx * 2] = i0 - i2
        elif factor == 5:
            fft5_2 = F(0.559016994374947424102293417182819)
            fft5_3 = F(-0.951056516295153572116439333379382)
            fft5_4 = F(-1.538841768587626701285145288018455)
            fft5_5 = F(0.363271264002680442947733378740309)
            quarter = F(0.25)
            for i in range(0, n, cur):
                for j in range(nx):
                    dw = dw0 * j
                    v0 = i + j
                    v1 = v0 + nx * 2
                    v2 = v1 + nx * 2
                    r3 = dre[:, v0 + nx].copy() * wre[dw] - dim[:, v0 + nx].copy() * wim[dw]
                    i3 = dre[:, v0 + nx].copy() * wim[dw] + dim[:, v0 + nx].copy() * wre[dw]
                    r2 = dre[:, v2].copy() * wre[dw * 4] - dim[:, v2].copy() * wim[dw * 4]
                    i2 = dre[:, v2].copy() * wim[dw * 4] + dim[:, v2].copy() * wre[dw * 4]
                    r1 = r3 + r2; i1 = i3 + i2
                    r3 = r3 - r2; i3 = i3 - i2
                    r4 = dre[:, v1 + nx].copy() * wre[dw * 3] - dim[:, v1 + nx].copy() * wim[dw * 3]
                    i4 = dre[:, v1 + nx].copy() * wim[dw * 3] + dim[:, v1 + nx].copy() * wre[dw * 3]
                    r0 = dre[:, v1].copy() * wre[dw * 2] - dim[:, v1].copy() * wim[dw * 2]
                    i0 = dre[:, v1].copy() * wim[dw * 2] + dim[:, v1].copy() * wre[dw * 2]
                    r2 = r4 + r0; i2 = i4 + i0
                    r4 = r4 - r0; i4 = i4 - i0
                    r0 = dre[:, v0].copy(); i0 = dim[:, v0].copy()
                    r5 = r1 + r2; i5 = i1 + i2
                    dre[:, v0] = r0 + r5; dim[:, v0] = i0 + i5
                    r0 = r0 - quarter * r5; i0 = i0 - quarter * i5
                    r1 = fft5_2 * (r1 - r2); i1 = fft5_2 * (i1 - i2)
                    r2 = -fft5_3 * (i3 + i4); i2 = fft5_3 * (r3 + r4)
                    i3 = i3 * (-fft5_5); r3 = r3 * fft5_5
                    i4 = i4 * (-fft5_4); r4 = r4 * fft5_4
                    r5 = r2 + i3; i5 = i2 + r3
                    r2 = r2 - i4; i2 = i2 - r4
                    r3 = r0 + r1; i3 = i0 + i1
                    r0 = r0 - r1; i0 = i0 - i1
                    dre[:, v0 + nx] = r3 + r2; dim[:, v0 + nx] = i3 + i2
                    dre[:, v2] = r3 - r2; dim[:, v2] = i3 - i2
                    dre[:, v1] = r0 + r5; dim[:, v1] = i0 + i5
                    dre[:, v1 + nx] = r0 - r5; dim[:, v1 + nx] = i0 - i5
        else:
            raise NotImplementedError(f"generic radix {factor}")

    if inv:
        dim = -dim
    return dre, dim


def check_complex(n, seed=0, inv=False):
    rng = np.random.default_rng(seed)
    re = rng.uniform(-100, 100, (3, n)).astype(F)
    im = rng.uniform(-100, 100, (3, n)).astype(F)
    x = np.stack([re, im], axis=-1)
    flags = cv2.DFT_COMPLEX_OUTPUT | cv2.DFT_ROWS
    if inv:
        flags |= cv2.DFT_INVERSE
    want = cv2.dft(x, flags=flags)
    gre, gim = cv_cdft(re, im, inv=inv)
    ok_re = np.array_equal(gre, want[..., 0])
    ok_im = np.array_equal(gim, want[..., 1])
    if not (ok_re and ok_im):
        dr = np.abs(gre.astype(np.float64) - want[..., 0])
        di = np.abs(gim.astype(np.float64) - want[..., 1])
        rel = max(dr.max() / (np.abs(want[..., 0]).max() + 1e-9),
                  di.max() / (np.abs(want[..., 1]).max() + 1e-9))
        nbad = int((dr > 0).sum() + (di > 0).sum())
        print(f"n={n:4d} inv={int(inv)} MISMATCH rel={rel:.3e} nbad={nbad}/{2*3*n}")
        return False
    print(f"n={n:4d} inv={int(inv)} OK (bit-exact)")
    return True


if __name__ == "__main__":
    for n in [2, 4, 8, 16, 32, 3, 9, 5, 25, 125, 6, 10, 12, 15, 20, 30,
              50, 100, 250]:
        check_complex(n)
    for n in [4, 5, 25, 250]:
        check_complex(n, inv=True)


# ---------------------------------------------------------------------------
# real forward DFT (CCS-packed rows) and CCS inverse, even n
# ---------------------------------------------------------------------------

def cv_rdft(x, variant=0):
    """Real forward DFT of each row of x [B, n] f32 -> CCS rows
    [y0, re1, im1, ..., re_{n/2}] (even n)."""
    x = np.ascontiguousarray(x, F)
    B, n = x.shape
    assert n % 2 == 0
    m = n // 2
    # half-size complex transform over (even, odd) interleave
    zr, zi = cv_cdft(x[:, 0::2], x[:, 1::2])
    # full-size wave table for the untangle
    _, wre, wim = dft_init(n, factorize(n))
    out = np.empty((B, n), F)
    out[:, 0] = zr[:, 0] + zi[:, 0]
    out[:, n - 1] = zr[:, 0] - zi[:, 0]
    half = F(0.5)
    for k in range(1, (m + 1) // 2 + 1):
        if k == m - k:  # middle element (m even): Z[k] with w^k = -i
            # X[m/2] = conj(Z[m/2]) * ... handle directly:
            # A = (Z+conj Z)/2 = (re, 0); B-part = (im, 0); w^k=(cos,sin)
            pass
        # generic untangle, computed for the pair (k, m-k)
    # vectorized untangle for k = 1..m-1 all at once (elementwise ops
    # round identically regardless of order across k)
    ks = np.arange(1, m)
    zr_k = zr[:, ks]; zi_k = zi[:, ks]
    zr_mk = zr[:, m - ks]; zi_mk = zi[:, m - ks]
    wr = wre[ks]; wi = wim[ks]
    if variant == 0:
        h1r = half * (zr_k + zr_mk)
        h1i = half * (zi_k - zi_mk)
        h2r = half * (zi_k + zi_mk)
        h2i = half * (zr_mk - zr_k)
        tr = wr * h2r - wi * h2i
        ti = wr * h2i + wi * h2r
        out[:, 2 * ks - 1] = h1r + tr
        out[:, 2 * ks] = h1i + ti
    elif variant == 1:  # 0.5 applied last
        h1r = zr_k + zr_mk
        h1i = zi_k - zi_mk
        h2r = zi_k + zi_mk
        h2i = zr_mk - zr_k
        tr = wr * h2r - wi * h2i
        ti = wr * h2i + wi * h2r
        out[:, 2 * ks - 1] = half * (h1r + tr)
        out[:, 2 * ks] = half * (h1i + ti)
    return out


def check_rdft(n, variant, B=2000, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-100, 100, (B, n)).astype(F)
    want = cv2.dft(x, flags=cv2.DFT_ROWS)
    got = cv_rdft(x, variant=variant)
    nbad = int((got != want).sum())
    print(f"rdft n={n:4d} variant={variant}: nbad={nbad}/{B*n}")
    return nbad == 0


if __name__ == "__main__" or True:
    pass


def cv_ccsidft(ccs, scale=None, variant=0):
    """Inverse of cv_rdft: CCS rows [B, n] -> real rows [B, n], times
    `scale` (1.0 if None), replicating cv2.idft(..., DFT_REAL_OUTPUT)."""
    ccs = np.ascontiguousarray(ccs, F)
    B, n = ccs.shape
    assert n % 2 == 0
    m = n // 2
    _, wre, wim = dft_init(n, factorize(n))
    # cv2's CCS inverse is UNNORMALIZED: no 0.5 in the untangle; the
    # requested scale is folded into the untangle constant instead
    s = F(1.0 if scale is None else scale)
    half = F(1.0)
    hs = F(1.0 if scale is None else scale)

    zr = np.empty((B, m), F)
    zi = np.empty((B, m), F)
    ks = np.arange(1, m)
    xr_k = ccs[:, 2 * ks - 1]; xi_k = ccs[:, 2 * ks]
    xr_mk = ccs[:, 2 * (m - ks) - 1]; xi_mk = -ccs[:, 2 * (m - ks)]
    wr = wre[ks]; wi = wim[ks]
    if variant == 2 and scale is not None:
        hs = F(1.0)  # scale applied to the final real output instead
    if variant == 3 and scale is not None:
        hs = F(1.0)
        xr_k = F(scale) * xr_k; xi_k = F(scale) * xi_k
        xr_mk = F(scale) * xr_mk; xi_mk = F(scale) * xi_mk
        z0r = None  # recomputed below
    if variant in (0, 2, 3):
        # h1 = (Xk + conj Xmk)/2 ; b = (Xk - conj Xmk)/2 * conj(w^k)
        h1r = hs * (xr_k + xr_mk)
        h1i = hs * (xi_k + xi_mk)
        h2r = hs * (xr_k - xr_mk)
        h2i = hs * (xi_k - xi_mk)
        br = wr * h2r + wi * h2i
        bi = wr * h2i - wi * h2r
        # Z = h1 + i*b
        zr[:, ks] = h1r - bi
        zi[:, ks] = h1i + br
    elif variant == 1:
        # unscaled untangle, scale applied to z afterwards
        h1r = half * (xr_k + xr_mk)
        h1i = half * (xi_k + xi_mk)
        h2r = half * (xr_k - xr_mk)
        h2i = half * (xi_k - xi_mk)
        br = wr * h2r + wi * h2i
        bi = wr * h2i - wi * h2r
        zr[:, ks] = s * (h1r - bi)
        zi[:, ks] = s * (h1i + br)
    z0r = ccs[:, 0]; znr = ccs[:, n - 1]
    if variant == 3 and scale is not None:
        z0r = F(scale) * z0r; znr = F(scale) * znr
    if variant in (0, 2, 3):
        zr[:, 0] = hs * (z0r + znr)
        zi[:, 0] = hs * (z0r - znr)
    else:
        zr[:, 0] = s * (half * (z0r + znr))
        zi[:, 0] = s * (half * (z0r - znr))
    yr, yi = cv_cdft(zr, zi, inv=True)
    out = np.empty((B, n), F)
    out[:, 0::2] = yr
    out[:, 1::2] = yi
    if variant == 2 and scale is not None:
        out = F(scale) * out
    return out


def check_ccsidft(n, variant, with_scale, B=2000, seed=4):
    rng = np.random.default_rng(seed)
    ccs = rng.uniform(-100, 100, (B, n)).astype(F)
    flags = cv2.DFT_INVERSE | cv2.DFT_ROWS | cv2.DFT_REAL_OUTPUT
    if with_scale:
        flags |= cv2.DFT_SCALE
    want = cv2.dft(ccs, flags=flags)
    got = cv_ccsidft(ccs, scale=(1.0 / n if with_scale else None),
                     variant=variant)
    nbad = int((got != want).sum())
    print(f"ccsidft n={n:4d} v={variant} scale={int(with_scale)}: "
          f"nbad={nbad}/{B*n}")
    return nbad == 0


# ---------------------------------------------------------------------------
# 2D real DFT (CCS), mulSpectrums, crossCorr, matchTemplate TM_CCOEFF
# ---------------------------------------------------------------------------

def cv_rdft2(a):
    """2D real forward DFT -> 2D CCS, [H, W] f32, H and W even."""
    a = np.ascontiguousarray(a, F)
    H, W = a.shape
    assert H % 2 == 0 and W % 2 == 0
    rows = cv_rdft(a)                       # CCS rows
    out = rows.copy()
    # columns 0 and W-1: cv2's column stage runs these as FULL-length
    # complex transforms with zero imaginary input, CCS-packing the
    # non-redundant half (verified empirically; it does NOT reuse the
    # half-size RealDFT used for rows)
    cols = np.stack([rows[:, 0], rows[:, W - 1]])
    zr, zi = cv_cdft(cols, np.zeros_like(cols))
    m = H // 2
    ks = np.arange(1, m)
    for r, c in ((0, 0), (1, W - 1)):
        out[0, c] = zr[r, 0]
        out[H - 1, c] = zr[r, m]
        out[2 * ks - 1, c] = zr[r, ks]
        out[2 * ks, c] = zi[r, ks]
    # middle complex columns: pairs (2j-1, 2j), j = 1..W/2-1
    js = np.arange(1, W // 2)
    cre = rows[:, 2 * js - 1].T.copy()      # [nj, H]
    cim = rows[:, 2 * js].T.copy()
    yre, yim = cv_cdft(cre, cim)
    out[:, 2 * js - 1] = yre.T
    out[:, 2 * js] = yim.T
    return out


def cv_ccsidft2(ccs, scale_variant=0):
    """2D CCS -> real inverse with DFT_SCALE (1/(H*W)), H, W even."""
    ccs = np.ascontiguousarray(ccs, F)
    H, W = ccs.shape
    s = 1.0 / (H * W)
    # column stage: rebuild each edge column's full conjugate-symmetric
    # complex spectrum from its CCS packing and run a full complex
    # inverse; the real parts are the columns (mirror of the forward)
    work = ccs.copy()
    m = H // 2
    ks = np.arange(1, m)
    zr = np.empty((2, H), F)
    zi = np.empty((2, H), F)
    for r, c in ((0, 0), (1, W - 1)):
        zr[r, 0] = ccs[0, c]; zi[r, 0] = 0
        zr[r, m] = ccs[H - 1, c]; zi[r, m] = 0
        zr[r, ks] = ccs[2 * ks - 1, c]
        zi[r, ks] = ccs[2 * ks, c]
        zr[r, H - ks] = ccs[2 * ks - 1, c]
        zi[r, H - ks] = -ccs[2 * ks, c]
    yr, yi = cv_cdft(zr, zi, inv=True)
    if scale_variant == 1:
        yr = F(1.0 / H) * yr
    work[:, 0] = yr[0]
    work[:, W - 1] = yr[1]
    js = np.arange(1, W // 2)
    cre = ccs[:, 2 * js - 1].T.copy()
    cim = ccs[:, 2 * js].T.copy()
    yre, yim = cv_cdft(cre, cim, inv=True)
    if scale_variant == 1:
        yre = F(1.0 / H) * yre
        yim = F(1.0 / H) * yim
    work[:, 2 * js - 1] = yre.T
    work[:, 2 * js] = yim.T
    # row stage: CCS inverse each row, with the (remaining) scale
    row_scale = s if scale_variant == 0 else 1.0 / W
    return cv_ccsidft(work, scale=row_scale, variant=2)


def cv_mulspectrums_conj(a, b):
    """mulSpectrums(a, b, conjB=True) on 2D CCS, H, W even.

    cv2 5.0 accumulates each complex product in f64 and rounds once
    (verified empirically, 0/1088 mismatches)."""
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    H, W = a.shape
    out = np.empty(a.shape, F)
    # middle complex columns: every row holds (re, im) pairs
    js = np.arange(1, W // 2)
    ar = a[:, 2 * js - 1]; ai = a[:, 2 * js]
    br = b[:, 2 * js - 1]; bi = b[:, 2 * js]
    out[:, 2 * js - 1] = (ar * br + ai * bi).astype(F)
    out[:, 2 * js] = (ai * br - ar * bi).astype(F)
    # columns 0 and W-1 are vertically CCS-packed 1D spectra
    for c in (0, W - 1):
        out[0, c] = F(a[0, c] * b[0, c])
        out[H - 1, c] = F(a[H - 1, c] * b[H - 1, c])
        is_ = np.arange(1, H // 2)
        ar = a[2 * is_ - 1, c]; ai = a[2 * is_, c]
        br = b[2 * is_ - 1, c]; bi = b[2 * is_, c]
        out[2 * is_ - 1, c] = (ar * br + ai * bi).astype(F)
        out[2 * is_, c] = (ai * br - ar * bi).astype(F)
    return out


def get_optimal_dft_size(n):
    best = None
    a = 1
    while a < n * 2:
        b = a
        while b < n * 2:
            c = b
            while c < n * 2:
                if c >= n and (best is None or c < best):
                    best = c
                c *= 5
            b *= 3
        a *= 2
    return best


def cv_cross_corr(img_u8, templ_u8):
    """OpenCV crossCorr (f32 DFT path) for u8 single-channel inputs.
    reference: cv2 3.4 templmatch.cpp crossCorr."""
    ih, iw = img_u8.shape
    th, tw = templ_u8.shape
    ch, cw = ih - th + 1, iw - tw + 1
    bw = min(max(round(tw * 4.5), 256 - tw + 1), cw)
    bh = min(max(round(th * 4.5), 256 - th + 1), ch)
    dw = max(get_optimal_dft_size(bw + tw - 1), 2)
    dh = get_optimal_dft_size(bh + th - 1)
    bw = min(dw - tw + 1, cw)
    bh = min(dh - th + 1, ch)

    dft_templ = np.zeros((dh, dw), F)
    dft_templ[:th, :tw] = templ_u8.astype(F)
    spec_t = cv_rdft2(dft_templ)

    corr = np.empty((ch, cw), F)
    for y in range(0, ch, bh):
        for x in range(0, cw, bw):
            bsz_h = min(bh, ch - y)
            bsz_w = min(bw, cw - x)
            dsz_h = bsz_h + th - 1
            dsz_w = bsz_w + tw - 1
            y2 = min(ih, y + dh)
            x2 = min(iw, x + dw)
            blk = np.zeros((dh, dw), F)
            blk[:y2 - y, :x2 - x] = img_u8[y:y2, x:x2].astype(F)
            # zero anything beyond the needed dft extent (cv2 only
            # copies the dsz window; rows beyond are stale-zero here)
            blk[dsz_h:, :] = 0
            blk[:, dsz_w:] = 0
            spec_i = cv_rdft2(blk)
            prod = cv_mulspectrums_conj(spec_i, spec_t)
            res = cv_ccsidft2(prod)
            corr[y:y + bsz_h, x:x + bsz_w] = res[:bsz_h, :bsz_w]
    return corr


def cv_match_template_ccoeff(img_u8, templ_u8):
    """cv2.matchTemplate(img, templ, TM_CCOEFF), plain f32-DFT path."""
    corr = cv_cross_corr(img_u8, templ_u8)
    th, tw = templ_u8.shape
    ih, iw = img_u8.shape
    ch, cw = corr.shape
    tmean = float(templ_u8.astype(np.float64).sum()) / (th * tw)
    ii = np.zeros((ih + 1, iw + 1), np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img_u8.astype(np.float64), 0), 1)
    wnd = (ii[th:th + ch, tw:tw + cw] - ii[th:th + ch, :cw]
           - ii[:ch, tw:tw + cw] + ii[:ch, :cw])
    return (corr.astype(np.float64) - wnd * tmean).astype(F)


def check_2d():
    rng = np.random.default_rng(6)
    for (h, w) in ((4, 6), (8, 10), (250, 250), (16, 50)):
        a = rng.uniform(-100, 100, (h, w)).astype(F)
        want = cv2.dft(a)
        got = cv_rdft2(a)
        print(f"rdft2 {h}x{w}: nbad={int((got != want).sum())}/{h*w}")
        ccs = rng.uniform(-100, 100, (h, w)).astype(F)
        want = cv2.dft(ccs, flags=cv2.DFT_INVERSE | cv2.DFT_SCALE
                       | cv2.DFT_REAL_OUTPUT)
        for sv in (0, 1):
            got = cv_ccsidft2(ccs, scale_variant=sv)
            print(f"ccsidft2 {h}x{w} sv={sv}: "
                  f"nbad={int((got != want).sum())}/{h*w}")
        b = rng.uniform(-100, 100, (h, w)).astype(F)
        want = cv2.mulSpectrums(a, b, 0, conjB=True)
        got = cv_mulspectrums_conj(a, b)
        print(f"mulspec {h}x{w}: nbad={int((got != want).sum())}/{h*w}")


def check_match(n_rand=4):
    import sys
    sys.path.insert(0, "/root/repo")
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(n_rand):
        img = rng.integers(0, 256, (250, 250), np.uint8)
        tpl = rng.integers(0, 256, (119, 188), np.uint8)
        cases.append((img, tpl))
    # non-250 geometry too (multi-block + different dft sizes)
    cases.append((rng.integers(0, 256, (480, 640), np.uint8),
                  rng.integers(0, 256, (119, 188), np.uint8)))
    cases.append((rng.integers(0, 256, (200, 210), np.uint8),
                  rng.integers(0, 256, (90, 141), np.uint8)))
    for k, (img, tpl) in enumerate(cases):
        want = cv2.matchTemplate(img, tpl, cv2.TM_CCOEFF)
        got = cv_match_template_ccoeff(img, tpl)
        nbad = int((got != want).sum())
        _, mv_w, _, loc_w = cv2.minMaxLoc(want)
        mv_g = float(got.max())
        print(f"match case {k} {img.shape}: nbad={nbad}/{want.size} "
              f"max want={mv_w!r} got={mv_g!r}")
