"""The batched, jit-compiled decode graph: uint8 meter-rect crops in,
per-image readings + error codes out.

This is the TPU-native restructuring of the reference's per-image
object/exception flow (meterelf/_api.py + _image.py + _reading.py):
arrays-over-batch with error codes, no data-dependent control flow, all
shapes static. One call decodes a whole batch; vmap supplies the batch
and per-dial axes; XLA maps the template correlation onto the MXU and
fuses the elementwise stages.

Stages (per image):
  1. exact BGR->HLS_FULL + wrapping hue shift        (ops/color.py)
  2. template correlation -> argmax location + score (ops/template.py)
  3. dial-cluster crop at the match location
  4. per dial: color sample -> inRange -> 3x3 close -> component
     analysis -> momentum/tip angle reductions       (ops/*.py)
  5. carry-corrected 4-dial value                    (ops/angles.py)
  6. error-code priority replicating the reference's raise order

Precision: "exact" mode keeps the reference's float64 semantics for the
angle statistics (all discrete decisions are integer-exact by
construction); "fast" mode runs them in float32 for TPU speed. See
ops/angles.py for why both modes share identical discrete behavior.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import ErrCode
from ..params import DIAL_WIN, Params, ParamArrays
from ..ops import angles as angles_ops
from ..ops import color as color_ops
from ..ops import components as comp_ops
from ..ops import morphology as morph_ops
from ..ops import template as template_ops


# stats implementation for the quad-kernel path: "fused" (stats kernel
# consumes the packed owner keys directly, computes cell contributions
# in-kernel, and the needle-region bit is derived at the angle-stage
# gather points — no contrib stage, no region raster, no masked/closed
# dequads; ops/pallas_stats.stats_select_fused +
# ops/angles.read_dial_from_okey), "hist_pallas" (VMEM one-hot
# histogram kernel over XLA-built contributions), or "sort" (XLA u16
# sort). hist_pallas was +10.7% full-pipeline over sort on v5e
# (50.6k vs 45.7k img/s, dispatch-floor-amortized bench A/B; an
# earlier "parity" reading came from a harness whose per-variant cost
# was dominated by the ~30 ms tunnel dispatch floor — see
# docs/performance.md "measurement trap"). "fused" then beat
# "hist_pallas" 56.1k vs 53.7k on the round-2 on-chip A/B queue
# (experiments/tpu_ab_round2.sh, bit-parity certified first by
# experiments/quad_kernels_check.py) and is the default. The quad path
# itself is selected only when conv_precision == "pallas", i.e. on TPU.
_QUAD_STATS = os.environ.get("METERELF_QUAD_STATS", "fused")
_STATS_SLICED = os.environ.get("METERELF_STATS_SLICED", "0") != "0"
_CCL_DEQUAD = os.environ.get("METERELF_CCL_DEQUAD", "1") != "0"
                 # the CCL kernel emits the per-window flat okey layout
                 # itself (the raster is already VMEM-resident) instead
                 # of an XLA dequad transpose feeding the stats kernel:
                 # +1.8% headline, reproduced (74,960/74,872 vs
                 # 73,632/73,505 img/s interleaved, v5e 2026-08-21) —
                 # VERDICT r4 ask #6 resolved with the kernel emitting
                 # the layout rather than the stats kernel re-addressing
                 # the quad
                             # pre-sliced i16 stats feed (span rows
                             # only, half the bytes) vs the full-window
                             # dequad. Measured NEUTRAL on the bench
                             # (69,505 vs 69,682 img/s — inside the
                             # ±0.7% spread): XLA's dequad copy is
                             # cheaper than its byte count suggests, so
                             # the default stays the simpler full
                             # relayout; knob kept so the result is not
                             # re-derived.

# frontend/windows composition for the quad path: "split" (separate
# frontend and window-mask kernels, superwindow round-trips HBM) or
# "merged" (ops/pallas_frontend.frontend_windows_pallas: the windows
# stage runs on the in-VMEM superwindow value). Perf A/B knob.
_FRONTEND = os.environ.get("METERELF_FRONTEND", "split")


class BatchResult(NamedTuple):
    err: jnp.ndarray              # [B] i32 ErrCode
    first_bad_dial: jnp.ndarray   # [B] i32 (valid when err == NEEDLE_CONTOURS)
    unreadable_bits: jnp.ndarray  # [B] i32 bitmask (valid when err == DIAL_ANGLE)
    match_val: jnp.ndarray        # [B] f32
    match_x: jnp.ndarray          # [B] i32
    match_y: jnp.ndarray          # [B] i32
    dial_pos: jnp.ndarray         # [B, D] f
    readable: jnp.ndarray         # [B, D] bool
    value: jnp.ndarray            # [B] f
    converged: jnp.ndarray        # [B] bool: CCL propagation fixpoint check


def _dial_masks_from_packed_window(
    win_pk: jnp.ndarray,       # [W, W] i32 packed BGR (b | g<<8 | r<<16)
    color_range: jnp.ndarray,  # [3] i32
    center_int,                # [2] i32 (window coords), or (x, y) python
                               # ints — static centers turn the 5x5 color
                               # sample into a fused static slice instead
                               # of a per-window gather
    mask_full: jnp.ndarray,    # [W, W] bool
    hue_shift,
):
    """Exact HLS + inRange + 3x3 close for one extracted dial window.

    Works on the packed-BGR representation (one i32 word per pixel):
    a channel-minor uint8 layout wastes 125/128 of each vector register,
    and packing is done once on the host. The unpack fuses into the HLS
    compares; the 5x5 dial-center color sample keeps the reference's
    integer-exact rounding (round(S/25) has no ties, _reading.py:154-160).
    """
    h, l, s = color_ops.bgr_planes_to_hls(
        (win_pk & 255).astype(jnp.uint8),
        ((win_pk >> 8) & 255).astype(jnp.uint8),
        ((win_pk >> 16) & 255).astype(jnp.uint8),
        hue_shift)
    hls_pl = jnp.stack([h, l, s])                         # [3, W, W] i32
    if isinstance(center_int, tuple):
        cx, cy = center_int
        core = hls_pl[:, cy - 2:cy + 3, cx - 2:cx + 3]
    else:
        core = lax.dynamic_slice(
            hls_pl,
            (jnp.int32(0), center_int[1] - 2, center_int[0] - 2),
            (3, 5, 5),
        )
    ssum = jnp.sum(core, axis=(1, 2))                     # [3] i32
    dial_color = (2 * ssum + 25) // 50
    lo = jnp.clip(dial_color - color_range, 0, 255)
    hi = jnp.clip(dial_color + color_range, 0, 255)
    raw = jnp.all(
        (hls_pl >= lo[:, None, None]) & (hls_pl <= hi[:, None, None]),
        axis=0)
    closed = morph_ops.close3(raw)
    masked = closed & mask_full
    return masked, closed


def _decode_batch(
    pa: ParamArrays,
    crops: jnp.ndarray,      # [B, ch, cw] i32 packed BGR, or [B,ch,cw,3] u8
    load_ok: jnp.ndarray,    # [B] bool
    *,
    conv_precision,
    sum_dtype=None,
    static_win_origin=None,  # ((ox, oy) per dial) as python ints, or None
    static_centers=None,     # ((cx, cy) per dial) as python ints, or None
    static_crop_hw=None,     # true (H, W) of the meter crop, or None
    static_bbox=None,        # per-dial stats bounding box (see analyze_batch)
    static_stats_spans=None,  # per-dial (y0, rows) disk-row extents for the
                             # fused stats kernel (pallas_stats.disk_row_spans)
    ccl_caps=None,           # CCL pass caps; None = corpus-tuned defaults,
                             # comp_ops.RESCUE_CAPS = guaranteed convergence
) -> BatchResult:
    th, tw = pa.template_zm.shape
    D = pa.mask_full.shape[0]
    W = DIAL_WIN
    B = crops.shape[0]

    # canonical internal format: one i32 word per pixel (b|g<<8|r<<16).
    # The host feeder packs (and optionally pads to the Pallas frontend
    # geometry) for free; u8 channel-last input (API compat) is packed
    # in-graph (~3.5 ms/batch — prefer feeding packed).
    if crops.ndim == 4:
        c32 = crops.astype(jnp.int32)
        packed = c32[..., 0] | (c32[..., 1] << 8) | (c32[..., 2] << 16)
    else:
        packed = crops
    crop_hw = tuple(static_crop_hw or ())
    if not crop_hw or crops.ndim == 4:
        crop_hw = tuple(crops.shape[1:3])

    from ..ops.pallas_frontend import (
        H_PAD as _FE_H, STAGE as _FE_S, W_PAD as _FE_W, fits as _fe_fits)
    use_frontend = (
        conv_precision == "pallas"
        and _fe_fits(*crop_hw, *pa.template_u8.shape)
        and packed.shape[1:3] in (crop_hw, (_FE_S, _FE_S), (_FE_H, _FE_W))
        and static_win_origin is not None
        and len(static_win_origin) == D
    )

    tsum = jnp.sum(pa.template_u8.astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)

    use_quad_kernels = (
        use_frontend and D == 4 and static_centers is not None)

    if use_frontend:
        if use_quad_kernels:
            # fused window-mask kernel (full-lane quad layout) + quad CCL:
            # replaces the XLA per-dial window stage AND the pair-packed
            # propagation staging (ops/pallas_windows.py)
            from ..ops.pallas_ccl import propagate_quads

            disk_quad = jnp.concatenate(
                [pa.mask_full[i].astype(jnp.int32) for i in range(D)],
                axis=1)                                    # [W, 4W]
            if _FRONTEND == "merged":
                # superwindow never leaves VMEM: the windows stage runs
                # inside the frontend kernel (pallas_frontend
                # frontend_windows_pallas)
                from ..ops.pallas_frontend import frontend_windows_pallas
                max_val, mx, my, bits = frontend_windows_pallas(
                    packed, pa.template_u8, tmean, disk_quad,
                    pa.color_range, pa.hue_shift,
                    static_win_origin, static_centers,
                    crop_hw=crop_hw)                       # [B, W, 4W]
            else:
                from ..ops.pallas_frontend import frontend_pallas
                from ..ops.pallas_windows import window_bits_quads
                max_val, mx, my, sw = frontend_pallas(
                    packed, pa.template_u8, tmean, crop_hw=crop_hw)
                bits = window_bits_quads(
                    sw, disk_quad, pa.color_range, pa.hue_shift,
                    static_win_origin, static_centers)     # [B, W, 4W]
            fused_stats = _QUAD_STATS.startswith("fused")
            from ..ops import pallas_stats
            # trace-time static: does the knob-gated pre-sliced i16
            # stats feed apply? (it consumes okey_q directly, so the
            # kernel-emitted flat layout would be a dead ~16 MB/batch
            # output — don't request it then)
            stats_sliced = (fused_stats and _STATS_SLICED
                            and static_stats_spans is not None
                            and pallas_stats.GW
                            % len(static_stats_spans) == 0)
            okey_kflat = None
            if fused_stats and _CCL_DEQUAD and not stats_sliced:
                # round-5: the CCL kernel emits the flat per-window
                # layout itself (okey already in VMEM), replacing the
                # XLA dequad transpose below
                okey_q, conv_q, okey_kflat = propagate_quads(
                    bits, caps=ccl_caps, pack_closed=True,
                    emit_flat=True)
            else:
                okey_q, conv_q = propagate_quads(
                    bits, caps=ccl_caps, pack_closed=fused_stats)

            def dequad(x):
                return (x.reshape(B, W, D, W).transpose(0, 2, 1, 3)
                        .reshape(B * D, W, W))

            if fused_stats:
                if stats_sliced:
                    # (the GW-divisibility gate inside stats_sliced
                    # mirrors the non-sliced fallback: a
                    # METERELF_STATS_GW override that does not divide
                    # by the dial count falls back to the full-window
                    # feed instead of tripping the kernel's trace-time
                    # assert)
                    # pre-sliced i16 feed: the stats kernel only reads
                    # each dial's disk-row span, so slice those rows
                    # BEFORE the dequad relayout and ship them biased
                    # i16 — the relayout (the stage's only HBM-bound
                    # step) moves ~R/64 the rows at half the bytes
                    spans_u = pallas_stats.uniform_row_spans(
                        static_stats_spans)
                    R = spans_u[0][1]
                    ok16 = ((okey_q - pallas_stats.I16_BIAS)
                            .astype(jnp.int16))
                    parts = [
                        lax.slice(ok16, (0, y0, d * W),
                                  (B, y0 + R, (d + 1) * W))
                        for d, (y0, _) in enumerate(spans_u)]
                    okey_f = jnp.stack(parts, axis=1).reshape(
                        B * D, R * W)
                    keymax, hasany_f = pallas_stats.stats_select_fused(
                        okey_f,
                        interpret=_QUAD_STATS.endswith("interpret"),
                        row_spans=static_stats_spans,
                        sliced_base=spans_u)
                elif okey_kflat is not None:
                    okey_f = okey_kflat.reshape(B * D, W * W)
                    keymax, hasany_f = pallas_stats.stats_select_fused(
                        okey_f,
                        interpret=_QUAD_STATS.endswith("interpret"),
                        row_spans=static_stats_spans)
                else:
                    # full-window flat feed: one dequad relayout; the
                    # angle gathers consume the quad raster directly
                    okey_f = dequad(okey_q).reshape(B * D, W * W)
                    keymax, hasany_f = pallas_stats.stats_select_fused(
                        okey_f,
                        interpret=_QUAD_STATS.endswith("interpret"),
                        row_spans=static_stats_spans)
                comp = None
            else:
                okey = dequad(okey_q)
                masked_f = dequad((bits & 1) != 0)
                closed_f = dequad(((bits >> 2) & 1) != 0)
                comp = comp_ops._finalize(
                    okey, masked_f, closed_f, conv_q.reshape(B * D),
                    static_bbox=static_bbox, stats=_QUAD_STATS)
        else:
            # dial windows at STATIC offsets within the superwindow
            from ..ops.pallas_frontend import frontend_pallas
            max_val, mx, my, sw = frontend_pallas(
                packed, pa.template_u8, tmean, crop_hw=crop_hw)
            masked_l, closed_l = [], []
            for i in range(D):
                ox, oy = static_win_origin[i]
                win_pk = sw[:, oy:oy + W, ox:ox + W]      # [B, W, W]
                ci = (static_centers[i] if static_centers is not None
                      else pa.centers_int[i])
                m, c = jax.vmap(
                    lambda wp, i=i, ci=ci: _dial_masks_from_packed_window(
                        wp, pa.color_range[i], ci,
                        pa.mask_full[i], pa.hue_shift)
                )(win_pk)
                masked_l.append(m)
                closed_l.append(c)
            masked = jnp.stack(masked_l, axis=1)          # [B, D, W, W]
            closed = jnp.stack(closed_l, axis=1)
    else:
        if packed.shape[1:3] != crop_hw:  # strip host-side frontend pad
            packed = packed[:, :crop_hw[0], :crop_hw[1]]
        b_pl = (packed & 255).astype(jnp.uint8)
        g_pl = ((packed >> 8) & 255).astype(jnp.uint8)
        r_pl = ((packed >> 16) & 255).astype(jnp.uint8)
        lightness = color_ops.lightness_from_planes(
            b_pl, g_pl, r_pl).astype(jnp.float32)
        if conv_precision in ("matmul", "pallas"):
            from ..ops.pallas_match2 import fits as _scorer_fits
            if (conv_precision == "pallas"
                    and _scorer_fits(*lightness.shape[1:],
                                     *pa.template_u8.shape)):
                from ..ops.pallas_match2 import match_scores_pallas_fused
                scores = match_scores_pallas_fused(
                    lightness, pa.template_u8, tmean)
            else:
                scores = template_ops.match_template_scores_matmul(
                    lightness, pa.template_u8, tmean)
        else:
            scores = template_ops.match_template_scores(
                lightness, pa.template_zm, precision=conv_precision)
        max_val, mx, my = template_ops.locate(scores)

        # per-(image, dial) window masks: one single-channel dynamic
        # slice from the packed image per window, then fused unpack+HLS
        def window(img_pk, x, y, i):
            return lax.dynamic_slice(
                img_pk,
                (y + pa.win_origin[i][1], x + pa.win_origin[i][0]),
                (W, W))

        masked, closed = jax.vmap(  # over batch
            lambda img, x, y: jax.vmap(  # over dials
                lambda i: _dial_masks_from_packed_window(
                    window(img, x, y, i),
                    pa.color_range[i], pa.centers_int[i],
                    pa.mask_full[i], pa.hue_shift,
                )
            )(jnp.arange(D))
        )(packed, mx, my)                                # [B, D, W, W]

    # stage B: ONE batched component analysis over all B*D windows
    # (the quad-kernel path above already produced `comp`)
    if not use_quad_kernels:
        disk_b = jnp.broadcast_to(pa.mask_full[None], (B, D, W, W))
        comp = comp_ops.analyze_batch(
            masked.reshape(B * D, W, W),
            closed.reshape(B * D, W, W),
            disk_b.reshape(B * D, W, W),
            # the fused VMEM-resident propagation kernel is TPU-only;
            # ride the same platform switch as the correlation kernel
            impl="pallas" if conv_precision == "pallas" else "xla",
            static_bbox=static_bbox,
            caps=ccl_caps,
        )
    if comp is None:  # fused-stats quad path
        has_any = hasany_f.reshape(B, D)
        conv = conv_q
        keymax_r = keymax.reshape(B, D)

        # stage C: angle statistics gathered straight from the CCL
        # kernel's native QUAD raster with index-adjusted static slots
        # (okey_q[y, d*64+x] == okey_f[d][y*64+x]) — the dequad
        # transpose then feeds ONLY the stats kernel; its second
        # consumer forced a materialized [B*D, W*W] relayout that cost
        # ~0.25 ms/256 (experiments/angles_quad_ab.py: angles delta
        # 0.58 -> 0.32 ms, identical checksums)
        okq = okey_q.reshape(B, W * D * W)

        def _quad_idx(idx, d):
            return ((idx >> 6) * jnp.int32(D * W)
                    + d.astype(jnp.int32) * jnp.int32(W)
                    + (idx & jnp.int32(W - 1)))

        per_dial = jax.vmap(  # over batch
            lambda okb, kmb: jax.vmap(  # over dials
                lambda i: angles_ops.read_dial_from_okey(
                    okb, kmb[i],
                    _quad_idx(pa.disk_idx[i], i), pa.disk_valid[i],
                    pa.disk_sx2[i], pa.disk_sy2[i],
                    _quad_idx(pa.ann_idx[i], i), pa.ann_valid[i],
                    pa.ann_x[i], pa.ann_y[i],
                    pa.ann_angle[i], pa.ann_sqd[i],
                    pa.neg_sign[i], pa.zero_turn[i],
                    sum_dtype=sum_dtype,
                )
            )(jnp.arange(D))
        )(okq, keymax_r)
    else:
        has_any = comp.has_any.reshape(B, D)
        conv = comp.converged.reshape(B, D)
        needle = comp.needle_region.reshape(B, D, W * W)

        # stage C: angle statistics per window (masked f64 reductions)
        per_dial = jax.vmap(  # over batch
            lambda nr: jax.vmap(  # over dials
                lambda i: angles_ops.read_dial(
                    nr[i],
                    pa.disk_idx[i], pa.disk_valid[i],
                    pa.disk_sx2[i], pa.disk_sy2[i],
                    pa.ann_idx[i], pa.ann_valid[i],
                    pa.ann_x[i], pa.ann_y[i], pa.ann_angle[i], pa.ann_sqd[i],
                    pa.neg_sign[i], pa.zero_turn[i],
                    sum_dtype=sum_dtype,
                )
            )(jnp.arange(D))
        )(needle)
    readable, positions = per_dial.readable, per_dial.position  # [B, D]

    f = positions.dtype
    if D == 4:
        value = jax.vmap(
            lambda p: angles_ops.assemble_value(p[pa.value_perm])
        )(positions)
    else:
        value = jnp.zeros(positions.shape[0], f)

    match_ok = max_val >= pa.threshold
    no_contours = ~has_any
    any_nc = no_contours.any(axis=1)
    first_bad = jnp.argmax(no_contours, axis=1).astype(jnp.int32)
    unreadable = has_any & ~readable
    any_unr = (~readable).any(axis=1)
    bits = jnp.sum(
        (~readable).astype(jnp.int32) * (1 << jnp.arange(D, dtype=jnp.int32)),
        axis=1,
    )

    err = jnp.where(
        ~load_ok,
        jnp.int32(ErrCode.LOAD),
        jnp.where(
            ~match_ok,
            jnp.int32(ErrCode.DIALS_NOT_FOUND),
            jnp.where(
                any_nc,
                jnp.int32(ErrCode.NEEDLE_CONTOURS),
                jnp.where(
                    any_unr,
                    jnp.int32(ErrCode.DIAL_ANGLE),
                    jnp.int32(ErrCode.OK),
                ),
            ),
        ),
    )
    del unreadable  # bits carries the full mask; host renders names

    return BatchResult(
        err=err,
        first_bad_dial=first_bad,
        unreadable_bits=bits,
        match_val=max_val,
        match_x=mx,
        match_y=my,
        dial_pos=positions,
        readable=readable,
        value=value,
        converged=conv.all(axis=1),
    )


def pack_crops_device(crops_u8: jnp.ndarray,
                      pad_hw: tuple | None = None) -> jnp.ndarray:
    """Device-side analog of io.jpeg.pack_crops: [B, H, W, 3] u8 BGR ->
    [B, H, W] i32 packed (b | g<<8 | r<<16), zero-padded to pad_hw.

    Lets hosts ship raw 3-byte/px crops (io.jpeg.load_crop_bytes_u8)
    over the host->device link and do the 4-byte staging expansion on
    the accelerator — 25% less H2D traffic on the end-to-end path."""
    c = crops_u8.astype(jnp.int32)
    packed = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)
    if pad_hw is not None:
        ph, pw = pad_hw
        h, w = packed.shape[1], packed.shape[2]
        packed = jnp.pad(packed, ((0, 0), (0, ph - h), (0, pw - w)))
    return packed


def make_coef_decode_fn(dec: "MeterDecoder",
                        frame_wh: tuple) -> tuple:
    """Compose the device JPEG back-half (ops/jpegdec.py) with the
    decode graph: one jitted dispatch from entropy-decoded DCT
    coefficient windows to readings.

    The host side only runs the inherently sequential Huffman decode
    (io.jpeg.load_coef_feed); dequantize + ISLOW IDCT + fancy chroma
    upsampling + YCbCr->BGR + crop/pack all fuse into the same graph
    that reads the dials. Fallback rows (pixel-path packed crops for
    frames the coefficient reader rejects) scatter over the back-half
    output; unused slots carry an out-of-range index and drop.

    Returns (step, win, pad_hw): ``step(param_arrays, coef_y, coef_cb,
    coef_cr, qt, load_ok, fb_packed, fb_idx) -> BatchResult``, the
    static CoefWindow the feed arrays must match, and the packed-crop
    padding the fallback slots must be staged at (pass it to
    io.jpeg.load_coef_feed)."""
    from ..ops import jpegdec

    from ..io.jpeg import frontend_pad_hw

    rect = dec.params.meter_rect
    win = jpegdec.coef_window(rect, frame_wh[0], frame_wh[1])
    crop_hw = (rect.height, rect.width)
    pad_hw = (frontend_pad_hw()
              if dec.feed_pad_hw != crop_hw else None)

    plane_shape = (win.lbh * 8, win.lbw * 8)
    block_shape = (win.lbh * win.lbw, 64)
    assert plane_shape != block_shape, "ambiguous coef layouts"

    @jax.jit
    def step(pa, cy, cb, cr, qt, ok, fb_packed, fb_idx):
        cy_shape = tuple(cy.shape[1:])
        if cy.dtype == jnp.int8:
            # compact 12-bit wire format (io/jpeg compact=True, plane
            # layout only): backhalf_planes_to_packed unpacks it inside
            # the fused kernel (or in XLA on the fallback tail)
            cy_shape = (cy.shape[1] * 2 // 3, cy.shape[2])
        if cy_shape == plane_shape:
            # frequency-plane feed -> fully fused Pallas back-half
            packed = jpegdec.backhalf_planes_to_packed(
                cy, cb, cr, qt, win, pad_hw=pad_hw)
        else:
            assert tuple(cy.shape[1:]) == block_shape, cy.shape
            packed = jpegdec.backhalf_to_packed(
                cy, cb, cr, qt, win, pad_hw=pad_hw)
        packed = packed.at[fb_idx].set(fb_packed, mode="drop")
        return dec._fn(pa, packed, ok)

    return step, win, (pad_hw if pad_hw is not None else crop_hw)


def _stats_bbox(mask_full: np.ndarray, sb: int = 48):
    """Static per-dial sub-box containing every disk pixel, for the
    component-stats sort (analyze_batch static_bbox). None when any
    dial's disk doesn't fit — the general full-window path then runs."""
    D, W, _ = mask_full.shape
    origins = []
    for i in range(D):
        ys, xs = np.nonzero(np.asarray(mask_full[i]))
        if len(xs) == 0:
            return None
        ox = int(min(xs.min(), W - sb))
        oy = int(min(ys.min(), W - sb))
        if xs.max() >= ox + sb or ys.max() >= oy + sb:
            return None
        origins.append((ox, oy))
    return (tuple(origins), sb)


def default_conv_precision() -> str:
    """Pick the correlation implementation for the current default
    device: the Pallas kernel on TPU, the XLA matmul formulation
    elsewhere (compiled Pallas is TPU-only)."""
    import jax as _jax

    dev = _jax.config.jax_default_device or _jax.devices()[0]
    return "pallas" if dev.platform == "tpu" else "matmul"


class MeterDecoder:
    """Compiled batched decoder for one camera configuration.

    exact=True keeps the reference's float64 statistics (requires jax
    x64); exact=False runs the continuous math in float32. Discrete
    decisions are integer-exact in both modes.
    """

    def __init__(
        self,
        params: Params,
        *,
        exact: bool = True,
        conv_precision=None,
    ) -> None:
        if conv_precision is None:
            conv_precision = default_conv_precision()
        self.params = params
        self.exact = exact
        # x64 is required in both modes: the angle statistics accumulate
        # in float64 (exact reference semantics); fast mode only demotes
        # the bulk per-pixel data to f32.
        jax.config.update("jax_enable_x64", True)
        pa = params.arrays()
        if not exact:
            f32 = (
                "zero_turn", "disk_sx2", "disk_sy2",
                "ann_x", "ann_y", "ann_angle", "ann_sqd",
            )
            pa = pa._replace(
                **{k: getattr(pa, k).astype(np.float32) for k in f32})
        self.param_arrays = pa
        self.crop_shape = (params.meter_rect.height, params.meter_rect.width, 3)
        # the staging shape host feeders should pad packed crops to:
        # the frontend's canonical block when this decoder will take the
        # fused Pallas path, else the bare crop (generalized gate — any
        # camera geometry inside the frontend family rides the kernel)
        from ..io.jpeg import frontend_pad_hw as _fe_pad
        from ..ops import pallas_stats
        from ..ops.pallas_frontend import fits as _fe_fits
        _crop_hw = (params.meter_rect.height, params.meter_rect.width)
        self.feed_pad_hw = (
            _fe_pad()
            if (conv_precision == "pallas"
                and _fe_fits(*_crop_hw, *pa.template_u8.shape))
            else _crop_hw)
        # window origins as static python ints: lets the Pallas frontend
        # path slice dial windows from the superwindow at compile time
        win_origin_static = tuple(
            (int(x), int(y)) for x, y in np.asarray(pa.win_origin))
        # centers are only promoted to static (fused 5x5 slice) when the
        # slice stays in bounds for every dial; a params file putting a
        # center within 2 px of the window edge falls back to the
        # dynamic_slice path, whose start indices clamp
        centers = tuple(
            (int(x), int(y)) for x, y in np.asarray(pa.centers_int))
        centers_safe = all(
            2 <= cx <= DIAL_WIN - 3 and 2 <= cy <= DIAL_WIN - 3
            for cx, cy in centers)
        self._static_kwargs = dict(
            conv_precision=conv_precision,
            sum_dtype=jnp.float64,
            static_win_origin=win_origin_static,
            static_centers=centers if centers_safe else None,
            static_crop_hw=(params.meter_rect.height,
                            params.meter_rect.width),
            static_bbox=_stats_bbox(pa.mask_full),
            static_stats_spans=pallas_stats.disk_row_spans(pa.mask_full),
        )
        self._fn = jax.jit(
            functools.partial(_decode_batch, **self._static_kwargs))
        self._rescue_fn = None  # compiled on first non-converged batch

    def __call__(self, crops_u8, load_ok=None) -> BatchResult:
        if load_ok is None:
            load_ok = jnp.ones(crops_u8.shape[0], bool)
        return self._fn(self.param_arrays, crops_u8, load_ok)

    def decode_numpy(self, crops_u8: np.ndarray,
                     load_ok: Optional[np.ndarray] = None) -> BatchResult:
        """Decode and pull results to host numpy.

        If any image's CCL propagation failed to reach its fixpoint
        under the corpus-tuned pass caps (pathological needle masks —
        never the corpus), the batch is re-decoded through the rescue
        graph (comp_ops.RESCUE_CAPS: generous caps, pay-per-pass via
        the early-exit loops) and the non-converged rows are replaced.
        Guarantees no silently-mislabeled component analysis ever
        reaches a caller."""
        res = jax.tree.map(np.asarray, self(crops_u8, load_ok))
        return self.rescue_numpy(crops_u8, res, load_ok)

    def rescue_numpy(self, crops_u8: np.ndarray, res: BatchResult,
                     load_ok: Optional[np.ndarray] = None) -> BatchResult:
        """Replace any non-converged rows of an already-computed (host)
        BatchResult for `crops_u8` via the rescue graph — the entry point
        for callers that dispatched the default graph themselves (e.g.
        the streaming loop) and only discovered non-convergence at drain
        time; skips the redundant default-graph re-run decode_numpy
        would pay."""
        if bool(res.converged.all()):
            return res
        if self._rescue_fn is None:
            from ..ops import components as comp_ops
            self._rescue_fn = jax.jit(functools.partial(
                _decode_batch, ccl_caps=comp_ops.RESCUE_CAPS,
                **self._static_kwargs))
        if load_ok is None:
            load_ok = jnp.ones(crops_u8.shape[0], bool)
        res2 = jax.tree.map(
            np.asarray,
            self._rescue_fn(self.param_arrays, crops_u8, load_ok))
        if not bool(res2.converged.all()):
            bad = np.nonzero(~res2.converged)[0].tolist()
            raise RuntimeError(
                "component propagation failed to converge even under "
                f"rescue caps for batch rows {bad}; refusing to emit "
                "potentially mislabeled readings")
        take = res.converged
        merged = type(res)(*[
            np.where(_bcast(take, a.shape), a, b)
            for a, b in zip(res, res2)
        ])
        return merged


def _bcast(mask: np.ndarray, shape) -> np.ndarray:
    """[B] bool -> broadcastable to a [B, ...] result field."""
    return mask.reshape(mask.shape + (1,) * (len(shape) - 1))
