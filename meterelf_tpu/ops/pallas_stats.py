"""VMEM-resident component-stats kernel: largest-component selection
via int8-MXU one-hot histograms.

Replaces the XLA u16-sort stats stage (ops/components.py _stats_sort)
on TPU. The XLA histogram formulation (_stats_hist) was measured slower
than the sort because its [K, NS, 64] one-hots round-trip HBM; here the
one-hots live and die in VMEM, so the stage is two small NT matmuls per
window plus one max-reduce.

Per 64x64 window, with owner labels l < 4096 at F-set pixels (component
+ enclosed holes, components.py) and the CCL sentinel 4096 elsewhere:

    hi = l >> 6, lo = l & 63   (the sentinel's hi = 64 falls outside
                                the one-hot range and drops out)
    A  [64, 4096] i8 = onehot(hi) over pixels
    Bb [64, 4096] i8 = onehot(lo) * boundary-bit
    Ba [64, 4096] i8 = onehot(lo) * marching-squares cell contribution
    B[hi, lo]  = A @ Bb^T   trace-pixel count per owner   (i32, exact)
    A2[hi, lo] = A @ Ba^T   doubled contourArea per owner (i32, exact)

B > 0 marks candidate components — exactly the top-level ones cv2's
RETR_EXTERNAL lists (components.py _stats_hist docstring; reference
meterelf/_reading.py:134-140). Selection key and tie-break are identical
to the sort path (area2 first, larger owner label on ties = Python's
stable sorted()[-1], reference _reading.py:132-148): the packed key
key = area2 * 4096 + owner is strictly ordered that way, and its max is
a plain i32 reduce. area2 <= 3*4096 keeps the key inside i32.

Unlike the sort path there is no u16-key constraint, so the static
per-dial stats bbox remap (components.py _finalize) is unnecessary:
labels stay full-window flat indices and the caller decodes
sel = key & 4095, area2 = key >> 12 directly.

Measured on v5e (experiments/stats_prof.py, K=1024): 1.16 ms for the
u16-sort stage -> 0.19 ms for this kernel end-to-end.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 64
N = W * W        # labels are flat window indices; N = CCL sentinel
GW = int(os.environ.get("METERELF_STATS_GW", "16"))
                 # windows per program (i32 sublane tile; >= 8).
                 # 16 measured best on the round-4 bench (64,862 vs
                 # 64,634 img/s at 8 — +0.35%, reproduced at +0.5% in a
                 # separate session; 32 compiles too slowly over the
                 # tunnel to evaluate). Env override for experiments.


def _stats_kernel(okey_ref, contrib_ref, out_ref):
    i32 = jnp.int32
    i8 = jnp.int8
    sub64 = lax.broadcasted_iota(i32, (64, N), 0)
    zeros = jnp.zeros((64, N), i32)
    cell = (lax.broadcasted_iota(i32, (64, 64), 0) * i32(64)
            + lax.broadcasted_iota(i32, (64, 64), 1))
    def dot_nt(x, y):
        return lax.dot_general(
            x, y, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=i32)

    for w in range(GW):
        ok = okey_ref[w:w + 1, :]                    # [1, N] i32
        owner = ok >> 2
        # materialize every sublane broadcast in i32 BEFORE comparing
        # (a replicated-source i1 compare can't be relayouted to the
        # packed i1 tiling), and keep the weighted one-hots pure bool:
        # Mosaic has neither i32->i8 converts nor i8 multiplies, but
        # bool->i8 casts and i32 matmul-output adds are enough — the
        # contrib payload (0..3) rides its two bits as separate masks.
        hi = (owner >> 6) + zeros
        lo = (owner & i32(63)) + zeros
        bbit = (ok & i32(1)) + zeros
        pc = contrib_ref[w:w + 1, :] + zeros
        a = (hi == sub64).astype(i8)                 # [64, N] onehot(hi)
        onelo = lo == sub64
        mb = (onelo & (bbit > 0)).astype(i8)
        # one-matmul doubled area: payload (pc & 3) <= 3 fits i8 and
        # sum(a * (pc & 3)) == h1 + 2*h2 (see _stats_fused_kernel)
        pay = jnp.where(onelo, pc & i32(3), i32(0)).astype(i8)
        hb = dot_nt(a, mb)                           # [64, 64] B
        ha = dot_nt(a, pay)                          # [64, 64] A2
        key = jnp.where(hb > 0, ha * i32(4096) + cell, i32(-1))
        out_ref[w, :] = jnp.full((128,), jnp.max(key), i32)


I16_BIAS = 8192  # okey3 <= N*8 + 7 = 32775 overflows int16; the
                 # pre-sliced feed ships (okey3 - I16_BIAS) as i16
                 # (range [-8192, 24583]) and the kernel re-biases


def _stats_fused_kernel(okey_ref, out_ref, *, row_spans=None,
                        sliced_base=None):
    """Fused variant: okey3 packing (owner*8 + closed*4 + masked*2 +
    boundary, pallas_ccl pack_closed=True) in, [keymax, has_any] row
    out. The marching-squares cell contributions (components.py
    _cell_contrib) are computed IN-KERNEL from the owner plane, so the
    XLA contrib stage and its HBM round trips disappear entirely
    (pipeline/decode.py fused-stats path).

    row_spans: optional per-dial (y0, rows) window-row extents of the
    dial disk masks (window w uses row_spans[w % len]); when given, the
    per-window one-hot contraction is restricted to those rows on BOTH
    the pixel (lane) axis and the hi-bin axis. Bit-exact: every support
    pixel (owner < N) lies inside the disk mask, so out-of-span pixels
    carry the hi = 64 sentinel and contribute nothing to either
    histogram; has_any still reduces over the full row. Measured -22%
    kernel time on corpus okey rasters (experiments/stats_kernel_prof.py,
    bbox variant, bit-identical).

    sliced_base: when given (per-window (y0u, R), uniform R), the input
    rows are ALREADY pre-sliced to window rows [y0u, y0u+R), shipped as
    i16 biased by -I16_BIAS so the relayout that builds the feed moves
    ~R/64 the rows at half the bytes; row_spans still carries the
    per-dial disk spans, read at offset (y0 - y0u) within the slice.
    Sound for the same reason the span restriction is: support pixels,
    their owner rows, masked pixels (has_any), and every valid contrib
    cell lie within the span; the contrib roll wrap-ins land on the
    slice's last row, which the vcell bound (r < R-1) masks exactly
    like r < 63 masks the full-window wrap."""
    i32 = jnp.int32
    i8 = jnp.int8
    ok_all = okey_ref[...]                       # [GW, LN] okey3
    if ok_all.dtype != i32:
        ok_all = ok_all.astype(i32) + i32(I16_BIAS)
    LN = ok_all.shape[1]
    rmax = LN // 64 - 1
    own_all = ok_all >> 3                        # owner, N at non-support

    # ---- cell contributions in flat-lane layout: lane j = r*64 + c,
    # cells live at r < 63 & c < 63. Cyclic roll wrap sources are always
    # invalid cells (r = 63 or c = 63), so no receive-side masks needed.
    lane_j = lax.broadcasted_iota(i32, (GW, LN), 1)
    r = lane_j >> 6
    c = lane_j & i32(63)
    o00 = own_all
    o01 = pltpu.roll(own_all, LN - 1, 1)         # j sees j + 1
    o10 = pltpu.roll(own_all, LN - 64, 1)        # j sees j + 64
    o11 = pltpu.roll(own_all, LN - 65, 1)
    m = jnp.minimum(jnp.minimum(o00, o01), jnp.minimum(o10, o11))
    e00 = (o00 == m).astype(i32)
    e01 = (o01 == m).astype(i32)
    e10 = (o10 == m).astype(i32)
    e11 = (o11 == m).astype(i32)
    k = e00 + e01 + e10 + e11
    vcell = ((r < i32(rmax)) & (c < i32(63))
             & (m < i32(N))).astype(i32)
    cls = vcell * jnp.where(k == 4, i32(2),
                            jnp.where(k == 3, i32(1), i32(0)))
    a01 = e01 * (1 - e00)
    a10 = e10 * (1 - e00) * (1 - e01)
    a11 = e11 * (1 - e00) * (1 - e01) * (1 - e10)
    contrib_all = (cls * e00
                   + pltpu.roll(cls * a01, 1, 1)     # from cell j - 1
                   + pltpu.roll(cls * a10, 64, 1)    # from cell j - 64
                   + pltpu.roll(cls * a11, 65, 1))   # from cell j - 65

    il = lax.broadcasted_iota(i32, (1, 128), 1)
    spans = (row_spans if row_spans is not None else ((0, 64),))

    def dot_nt(x, y):
        return lax.dot_general(
            x, y, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=i32)

    for w in range(GW):
        y0, rows = spans[w % len(spans)]
        ln = rows * 64
        if sliced_base is not None:
            off = (y0 - sliced_base[w % len(sliced_base)][0]) * 64
            sl = slice(off, off + ln)
        else:
            sl = slice(y0 * 64, y0 * 64 + ln)
        sub_h = lax.broadcasted_iota(i32, (rows, ln), 0) + i32(y0)
        sub_l = lax.broadcasted_iota(i32, (64, ln), 0)
        zh = jnp.zeros((rows, ln), i32)
        zl = jnp.zeros((64, ln), i32)
        cell = ((lax.broadcasted_iota(i32, (rows, 64), 0) + i32(y0))
                * i32(64)
                + lax.broadcasted_iota(i32, (rows, 64), 1))
        ok = ok_all[w:w + 1, sl]                     # [1, ln] i32
        owner = ok >> 3
        hi = (owner >> 6) + zh
        lo = (owner & i32(63)) + zl
        bbit = (ok & i32(1)) + zl
        pc = contrib_all[w:w + 1, sl] + zl
        a = (hi == sub_h).astype(i8)                 # [rows, ln] onehot(hi)
        onelo = lo == sub_l
        mb = (onelo & (bbit > 0)).astype(i8)
        # the doubled-area sum folds into ONE matmul: the payload
        # (pc & 3) = (pc & 1) + 2*(pc >> 1 & 1) <= 3 fits i8, and
        # sum(a * payload) == h1 + 2*h2 term-by-term — bit-identical
        # to the two-matmul form for the 2-bit contributions
        pay = jnp.where(onelo, pc & i32(3), i32(0)).astype(i8)
        hb = dot_nt(a, mb)                           # [rows, 64] B
        ha = dot_nt(a, pay)                          # [rows, 64] A2
        key = jnp.where(hb > 0, ha * i32(4096) + cell, i32(-1))
        km = jnp.max(key)
        anym = jnp.max((ok_all[w:w + 1, :] >> 1) & i32(1))  # has_any
        out_ref[w:w + 1, :] = jnp.where(
            il == 0, jnp.full((1, 128), km, i32),
            jnp.full((1, 128), anym, i32))


def disk_row_spans(mask_full: jnp.ndarray) -> tuple[tuple[int, int], ...]:
    """Per-dial (y0, rows) window-row extents of the disk masks for
    stats_select_fused's restricted contraction: mask extent padded by
    one row each side (the in-kernel contrib cells read one row past a
    support pixel) and even-aligned so the lane slice y0*64 lands on a
    128 boundary. Empty masks degrade to the full window."""
    import numpy as np

    spans = []
    for d in range(mask_full.shape[0]):
        ys = np.nonzero(np.asarray(mask_full[d]))[0]
        if ys.size == 0:
            spans.append((0, 64))
            continue
        y0 = max(0, int(ys.min()) - 1)
        y1 = min(64, int(ys.max()) + 2)
        y0 -= y0 % 2
        y1 += y1 % 2
        y1 = min(64, max(y1, y0 + 8))  # Mosaic sublane-dim floor
        spans.append((y0, y1 - y0))
    return tuple(spans)


def uniform_row_spans(
        spans: tuple[tuple[int, int], ...]
) -> tuple[tuple[int, int], ...]:
    """Rewrite disk_row_spans to one uniform row count R = max rows
    (shifting y0 up where y0 + R would pass the window bottom — extra
    padding rows above are harmless) so every window can be pre-sliced
    to the same shape for the pre_sliced stats feed."""
    R = max(r for _, r in spans)
    return tuple((min(y0, W - R), R) for y0, _ in spans)


def stats_select_fused(okey3: jnp.ndarray, interpret: bool = False,
                       row_spans: tuple | None = None,
                       sliced_base: tuple | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """okey3 [K, W, W] or [K, N] i32 in the pack_closed layout
    (owner = okey3 >> 3, boundary bit = okey3 & 1, masked bit =
    (okey3 >> 1) & 1) -> (key_max [K] i32 as stats_select, has_any [K]
    bool). Cell contributions are derived in-kernel; callers skip
    components._cell_contrib and the masked-plane dequad entirely.

    row_spans: optional per-dial (y0, rows) extents (disk_row_spans);
    window w uses row_spans[w % len] — valid when K iterates dials
    minor-most and GW is a multiple of len(row_spans). Bit-identical
    to the full-window contraction, ~22% faster.

    sliced_base: okey3 is [K, R*64] int16 (uniform_row_spans slices,
    R = sliced_base[*][1]) biased by -I16_BIAS; the feed relayout moves
    ~R/64 the rows at half the bytes (see _stats_fused_kernel docstring
    for the soundness argument)."""
    K = okey3.shape[0]
    if sliced_base is not None:
        assert row_spans is not None and GW % len(row_spans) == 0
        assert len(sliced_base) == len(row_spans)
        r_u = sliced_base[0][1]
        assert all(r == r_u for _, r in sliced_base)
        ln = r_u * 64
        assert okey3.shape[1:] == (ln,) and okey3.dtype == jnp.int16
        okf = okey3
        pad_val = jnp.int16(N * 8 - I16_BIAS)  # sentinel owner rows
    else:
        if row_spans is not None and GW % len(row_spans) != 0:
            row_spans = None  # dial phase would drift across grid blocks
        ln = N
        okf = okey3.reshape(K, N).astype(jnp.int32)
        pad_val = jnp.int32(N * 8)
    kp = -(-K // GW) * GW
    if kp != K:  # pad with sentinel-owner rows: hi = 64, no candidates
        okf = jnp.concatenate(
            [okf, jnp.full((kp - K, ln), pad_val)], axis=0)
    kernel = functools.partial(_stats_fused_kernel, row_spans=row_spans,
                               sliced_base=sliced_base)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((kp, 128), jnp.int32),
            grid=(kp // GW,),
            in_specs=[
                pl.BlockSpec((GW, ln), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((GW, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(okf)
    return out[:K, 0], out[:K, 1] != 0


def stats_select(okey: jnp.ndarray, contrib: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """okey [K, W, W] i32 packed owner keys (owner = okey >> 2, trace
    bit = okey & 1, components.py), contrib [K, W, W] i32 cell
    contributions -> key_max [K] i32: area2*4096 + owner label of the
    selected component, or -1 when the window has no candidate."""
    K = okey.shape[0]
    assert okey.shape[1:] == (W, W) and contrib.shape == okey.shape
    # hard-pin i32: callers trace under ambient x64, and any i64 leaking
    # into the kernel sends Mosaic's convert lowering into recursion
    okf = okey.reshape(K, N).astype(jnp.int32)
    pcf = contrib.reshape(K, N).astype(jnp.int32)
    kp = -(-K // GW) * GW
    if kp != K:  # pad with sentinel-owner rows: hi = 64, no candidates
        okf = jnp.concatenate(
            [okf, jnp.full((kp - K, N), jnp.int32(N * 4))], axis=0)
        pcf = jnp.concatenate(
            [pcf, jnp.zeros((kp - K, N), jnp.int32)], axis=0)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _stats_kernel,
            out_shape=jax.ShapeDtypeStruct((kp, 128), jnp.int32),
            grid=(kp // GW,),
            in_specs=[
                pl.BlockSpec((GW, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GW, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((GW, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(okf, pcf)
    return out[:K, 0]
