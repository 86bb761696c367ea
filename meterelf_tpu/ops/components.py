"""Connected-component analysis on per-dial windows, replacing
cv2.findContours / contourArea / drawContours (reference:
meterelf/_reading.py:132-148) with fixed-shape dense integer ops.

Semantics replicated:

- findContours(RETR_EXTERNAL) returns one outer contour per top-level
  8-connected component; components nested inside another component's
  hole are not candidates. We detect top-level components by flooding the
  "outside" background (4-connected, per Suzuki duality) from outside the
  dial disk.
- contourArea is the Green-formula area of the traced outer boundary.
  We use the Pick-theorem surrogate  area = F - B/2 - 1  (F = pixels
  inside-or-on the filled outer polygon, including holes; B = component
  pixels 8-adjacent to outside). Validated over all 1208 corpus dials:
  the surrogate picks the same largest component, makes the same
  (area > 100) decision, and produces the identical filled mask
  (experiments/area_check.py).
- drawContours(..., thickness=-1) fill = component plus its enclosed
  holes.
- Largest selection replicates Python's stable sorted()[-1]: ties by
  area are broken toward the contour found LAST in raster order, i.e.
  the larger component root index.

TPU mapping (measured in docs/performance.md):

- one batched call over all B*D windows (vmap lowers to the same, but
  the batched form lets the stats stage run one big sort);
- segmented scans ride native reverse cumsum/cummax (no flips), and the
  run-id offsets (cumsum of the walls) are LOOP-INVARIANT, computed once
  and reused by every propagation pass — that alone removes ~32 of the
  ~80 memory-bound scan ops per call;
- per-component stats ride ONE uint16 sort per window (a (key, payload)
  i32 pair sort is ~4.5x more expensive): key = owner*4 + bits, run
  length gives F directly, and a single packed cumsum carries both the
  masked and boundary counts.
- window-pair lane packing ([M, 64, 128]) was tried and is ~50% SLOWER
  than the plain [K, 64, 64] batch (experiments/ccl_variants.py) — XLA's
  chosen layouts beat hand-packing here; do not resurrect it.

Everything runs on a [W, W] window (W=64) that provably contains the
dial's mask disk, so results equal full-template processing exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# propagation iteration counts, sized from measured fixpoint distances
# over the full 1216-dial corpus (label: hybrid scan+min passes max 5;
# outside: 30 plain steps; fill: 5) plus safety margin. analyze() also
# reports a convergence bit (one extra step changes nothing) so
# out-of-corpus shapes that need more iterations are detected, not
# silently mislabeled.
K_LABEL_HYBRID = 7
K_OUTSIDE_HYBRID = 4
K_FILL = 8


class ComponentResult(NamedTuple):
    has_any: jnp.ndarray        # [...] bool: masked image nonempty
    needle_region: jnp.ndarray  # [..., W, W] bool: reference's needle_mask
    converged: jnp.ndarray      # [...] bool: propagations reached fixpoint


_SEG_BASE = 8192  # > any window label value (W*W + 1)


class _SegWalls(NamedTuple):
    """Precomputed run-id offsets for segmented scans against one wall
    set: rid[i] = number of walls at-or-before i in scan direction.
    Loop-invariant across propagation passes."""
    fwd_row: jnp.ndarray
    rev_row: jnp.ndarray
    fwd_col: jnp.ndarray
    rev_col: jnp.ndarray


def _make_walls(wall: jnp.ndarray) -> _SegWalls:
    w = wall.astype(jnp.int32)
    return _SegWalls(
        fwd_row=lax.cumsum(w, axis=wall.ndim - 1),
        rev_row=lax.cumsum(w, axis=wall.ndim - 1, reverse=True),
        fwd_col=lax.cumsum(w, axis=wall.ndim - 2),
        rev_col=lax.cumsum(w, axis=wall.ndim - 2, reverse=True),
    )


def _rid_of(walls: _SegWalls, axis: int, reverse: bool) -> jnp.ndarray:
    if axis == -1:
        return walls.rev_row if reverse else walls.fwd_row
    return walls.rev_col if reverse else walls.fwd_col


def _seg_min_sweep(vals: jnp.ndarray, walls: _SegWalls) -> jnp.ndarray:
    """All four segmented cummin sweeps (fwd/rev x row/col), using the
    monotone-offset transform: v' = rid*BASE + (BASE-1-v). Later runs (in
    scan direction) get strictly larger offsets, so a global cummax never
    leaks values across run boundaries; within a run max(BASE-1-v)
    recovers min(v)."""
    nd = vals.ndim
    for axis, reverse in ((-1, False), (-1, True), (-2, False), (-2, True)):
        rid = _rid_of(walls, axis, reverse)
        vp = rid * _SEG_BASE + (_SEG_BASE - 1 - vals)
        m = lax.cummax(vp, axis=axis % nd, reverse=reverse)
        vals = (_SEG_BASE - 1) - (m - rid * _SEG_BASE)
    return vals


def _seg_or_sweep(vals: jnp.ndarray, walls: _SegWalls) -> jnp.ndarray:
    """All four segmented cumulative-OR sweeps; same offset trick with
    0/1 payloads."""
    nd = vals.ndim
    for axis, reverse in ((-1, False), (-1, True), (-2, False), (-2, True)):
        rid = _rid_of(walls, axis, reverse)
        vp = rid * 2 + vals.astype(jnp.int32)
        m = lax.cummax(vp, axis=axis % nd, reverse=reverse)
        vals = (m - rid * 2) > 0
    return vals


def _min3x3(x: jnp.ndarray, big: int) -> jnp.ndarray:
    nd = x.ndim
    return lax.reduce_window(
        x, jnp.asarray(big, x.dtype), lax.min,
        window_dimensions=(1,) * (nd - 2) + (3, 3),
        window_strides=(1,) * nd,
        padding=[(0, 0)] * (nd - 2) + [(1, 1), (1, 1)],
    )


def _any4(x: jnp.ndarray) -> jnp.ndarray:
    """OR of the 4-neighborhood (von Neumann), border = False."""
    z2 = [(0, 0)] * (x.ndim - 2)
    up = jnp.pad(x[..., 1:, :], z2 + [(0, 1), (0, 0)])
    dn = jnp.pad(x[..., :-1, :], z2 + [(1, 0), (0, 0)])
    lf = jnp.pad(x[..., :, 1:], z2 + [(0, 0), (0, 1)])
    rt = jnp.pad(x[..., :, :-1], z2 + [(0, 0), (1, 0)])
    return up | dn | lf | rt


def _any8(x: jnp.ndarray) -> jnp.ndarray:
    nd = x.ndim
    return lax.reduce_window(
        x, False, lax.bitwise_or,
        window_dimensions=(1,) * (nd - 2) + (3, 3),
        window_strides=(1,) * nd,
        padding=[(0, 0)] * (nd - 2) + [(1, 1), (1, 1)],
    )


def analyze(
    masked: jnp.ndarray,     # [W, W] bool: closed needle mask & dial mask
    closed: jnp.ndarray,     # [W, W] bool: closed needle mask (unmasked)
    disk: jnp.ndarray,       # [W, W] bool: dial full-disk mask (static)
) -> ComponentResult:
    """Single-window convenience wrapper over analyze_batch."""
    res = analyze_batch(masked[None], closed[None], disk[None])
    return ComponentResult(
        has_any=res.has_any[0],
        needle_region=res.needle_region[0],
        converged=res.converged[0],
    )


def analyze_batch(
    masked: jnp.ndarray,     # [K, W, W] bool
    closed: jnp.ndarray,     # [K, W, W] bool
    disk: jnp.ndarray,       # [K, W, W] bool
    impl: str = "xla",       # "xla" | "pallas" (TPU-only) | "pallas_interpret"
    static_bbox=None,        # (((ox, oy) per dial), SB): static sub-box that
                             # provably contains every disk pixel; shrinks the
                             # stats domain from W*W to SB*SB keys per window.
                             # K must then be a multiple of len(origins).
    stats: str = "sort",     # "sort" (u16 sort) | "hist" (MXU histogram)
    caps=None,               # (k_label, k_outside, k_fill) pass caps; None =
                             # the corpus-tuned defaults. High caps (the
                             # RESCUE_CAPS rescue path) guarantee convergence
                             # on pathological masks: in XLA they switch the
                             # unrolled loops to lax.while_loop.
) -> ComponentResult:
    """Batched component analysis. impl="pallas" runs the propagation
    passes in one fused VMEM-resident kernel (ops/pallas_ccl.py); the
    stats stage (largest-component selection) is shared."""
    if impl.startswith("pallas"):
        from .pallas_ccl import propagate
        okey, converged = propagate(
            masked, disk, interpret=impl.endswith("interpret"), caps=caps)
    else:
        okey, converged = _propagate_xla(masked, disk, caps=caps)
    return _finalize(okey, masked, closed, converged,
                     static_bbox=static_bbox, stats=stats)


def _iterate(k_max: int, body, x0):
    """Run body up to k_max times; -> (x_final, eq = elementwise
    "the final pass changed nothing"). Small caps unroll (XLA fuses
    across passes); large caps ride a lax.while_loop with early exit
    (compile size stays constant, runtime is pay-per-pass)."""
    if k_max <= 12:
        prev = x0
        x = x0
        for _ in range(k_max):
            prev = x
            x = body(x)
        return x, x == prev

    def cond(c):
        i, done, _, _ = c
        return (i < jnp.int32(k_max)) & jnp.logical_not(done)

    def step(c):
        i, _, x, _ = c
        nx = body(x)
        eq = nx == x
        return (i + jnp.int32(1), eq.all(), nx, eq)

    _, _, xf, eqf = lax.while_loop(
        cond, step,
        (jnp.int32(0), jnp.bool_(False), x0, jnp.zeros_like(x0, bool)))
    return xf, eqf


# rescue-path caps: generous enough for any plausible 64x64 mask (a
# full serpentine needs ~one hybrid pass per switchback, <= 64); decode
# users re-run non-converged windows through these (pipeline/decode.py)
RESCUE_CAPS = (128, 64, 192)


def _propagate_xla(
    masked: jnp.ndarray,     # [K, W, W] bool
    disk: jnp.ndarray,       # [K, W, W] bool
    caps=None,
):
    """-> (owner_key i32 [K, W, W], converged bool [K]) where
    owner_key = owner*4 + masked*2 + boundary, owner = N at non-support
    pixels — the packed key _finalize sorts."""
    k_label, k_outside, k_fill = caps or (
        K_LABEL_HYBRID, K_OUTSIDE_HYBRID, K_FILL)
    K, W, W2 = masked.shape
    assert W2 == W
    N = W * W
    BIG = N

    idx = (
        lax.broadcasted_iota(jnp.int32, (W, W), 0) * W
        + lax.broadcasted_iota(jnp.int32, (W, W), 1)
    )

    # ---- 8-connected component labels (min flat index per component) ----
    # hybrid propagation: one 3x3 min (glues diagonals) + segmented
    # row/col cummin sweeps (propagate through straight runs in one shot)
    labels = jnp.where(masked, idx, BIG)
    label_walls = _make_walls(~masked)

    def hybrid_pass(lab):
        lab = jnp.where(masked, jnp.minimum(lab, _min3x3(lab, BIG)), BIG)
        lab = _seg_min_sweep(lab, label_walls)
        return jnp.where(masked, lab, BIG)

    # convergence = "the final pass changed nothing": saves the separate
    # verification pass the old formulation ran after the loop (the caps
    # carry >=2 passes of margin over the measured corpus fixpoint
    # distances, so this stricter flag — distance <= cap-1 instead of
    # <= cap — never fires on the corpus, and still never mislabels:
    # a non-no-op final pass is flagged, not trusted)
    labels, labels_eq = _iterate(k_label, hybrid_pass, labels)

    # ---- outside background (bg 4-connected to beyond the dial disk) ----
    bg = ~masked
    outside = bg & ~disk
    bg_walls = _make_walls(masked)

    def out_pass(out):
        out = out | (bg & _any4(out))
        out = _seg_or_sweep(out, bg_walls)
        return out & bg

    outside, outside_eq = _iterate(k_outside, out_pass, outside)
    enclosed = bg & ~outside
    support = masked | enclosed

    # ---- assign enclosed holes to their surrounding component ----
    def fill_pass(own):
        return jnp.where(
            enclosed, jnp.minimum(own, _min3x3(own, BIG)), own)

    owner, fill_eq = _iterate(
        k_fill, fill_pass, jnp.where(masked, labels, BIG))

    def conv_per_window(eq):
        return eq.all(axis=(1, 2))

    converged = (conv_per_window(labels_eq)
                 & conv_per_window(outside_eq)
                 & conv_per_window(fill_eq))

    boundary = masked & _any8(outside)
    okey = (
        jnp.where(support, owner, N) * 4
        + masked.astype(jnp.int32) * 2
        + boundary.astype(jnp.int32)
    )
    return okey, converged


def _finalize(
    okey: jnp.ndarray,       # [K, W, W] i32 packed owner key
    masked: jnp.ndarray,     # [K, W, W] bool
    closed: jnp.ndarray,     # [K, W, W] bool
    converged: jnp.ndarray,  # [K] bool
    static_bbox=None,
    stats: str = "sort",
) -> ComponentResult:
    K, W, _ = okey.shape
    N = W * W

    # ---- per-component statistics ----
    # key = owner*4 + masked*2 + boundary <= 4*N + 3 < 2^16.
    # Every support pixel lies inside the dial disk, so when the caller
    # provides a static per-dial bounding box the stats cover SB*SB keys
    # instead of W*W (out-of-box pixels all carry the non-support key and
    # contribute nothing to any component's totals).
    if static_bbox is not None:
        origins, SB = static_bbox
        D = len(origins)
        ok4 = okey.reshape(K // D, D, W, W)
        packed = jnp.stack(
            [ok4[:, i, oy:oy + SB, ox:ox + SB]
             for i, (ox, oy) in enumerate(origins)], axis=1,
        ).reshape(K, SB * SB)
        NS = SB * SB
    else:
        packed = okey.reshape(K, N)
        NS = N

    if stats == "hist":
        sel, area2_sel = _stats_hist(packed, K, NS, N)
    else:
        sel, area2_sel = _stats_sort(packed, K, NS, N)

    big_blob = area2_sel > 200  # contourArea > 100 (reference threshold)
    owner_key = okey >> 2                       # owner, N at non-support
    fill_sel = ((owner_key == sel[:, None, None])
                & (sel[:, None, None] < N))
    needle_region = jnp.where(big_blob[:, None, None], fill_sel, closed)

    return ComponentResult(
        has_any=masked.any(axis=(1, 2)),
        needle_region=needle_region,
        converged=converged,
    )


def _stats_hist(packed: jnp.ndarray, K: int, NS: int, N: int):
    """Per-component (F, C, B) via an MXU one-hot histogram.

    owner = hi*64 + lo with hi, lo < 64 (owner = N = 4096 at
    non-support pixels falls outside the hi range and drops out).  One
    batched int8 matmul between the hi one-hot [K, 64, NS] and the lo
    one-hot weighted by the three indicator payloads [K, NS, 3*64]
    yields all three 64x64 histograms at once, exactly, in i32:

        F[hi, lo] = #support pixels of owner      (one-hot weight 1)
        C[hi, lo] = #masked pixels of owner       (weight masked-bit)
        B[hi, lo] = #boundary pixels of owner     (weight boundary-bit)

    Measured on v5e (experiments/stats_prof.py): the one-hot
    materializations (~300 MB HBM at K=2048) make this SLOWER than the
    u16 sort in XLA form (4.0 vs 3.1 ms/batch at B=256) — kept as a
    cross-validated alternative (and the design for an eventual
    VMEM-resident in-kernel variant, where the one-hots never touch
    HBM).  Selection key and tie-break are identical to the sort path
    (area2*N + owner, larger owner wins ties = Python's stable
    sorted()[-1], reference _reading.py:132-148)."""
    owner = packed >> 2                          # [K, NS], N at non-support
    mbit = ((packed >> 1) & 1).astype(jnp.int8)
    bbit = (packed & 1).astype(jnp.int8)
    support = (owner < N).astype(jnp.int8)
    hi = owner >> 6
    lo = owner & 63

    iota64 = lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
    a = (hi[:, None, :] == jnp.transpose(iota64, (0, 2, 1))
         ).astype(jnp.int8)                      # [K, 64, NS]
    ol = (lo[:, :, None] == iota64).astype(jnp.int8)   # [K, NS, 64]
    bm = jnp.concatenate(
        [ol * support[:, :, None], ol * mbit[:, :, None],
         ol * bbit[:, :, None]], axis=2)         # [K, NS, 192]
    h = lax.dot_general(
        a, bm, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)        # [K, 64, 192]
    f = h[:, :, 0:64].reshape(K, 4096)
    c = h[:, :, 64:128].reshape(K, 4096)
    bc = h[:, :, 128:192].reshape(K, 4096)

    area2 = 2 * f - bc - 2
    cell = lax.broadcasted_iota(jnp.int32, (K, 4096), 1)
    valid = (f > 0) & (c > 0)
    key = jnp.where(valid, jnp.maximum(area2, 0) * N + cell, jnp.int32(-1))
    i_sel = jnp.argmax(key, axis=1)
    sel = jnp.take_along_axis(cell, i_sel[:, None], 1)[:, 0]
    area2_sel = jnp.take_along_axis(area2, i_sel[:, None], 1)[:, 0]
    # component-free window: match the sort path exactly (its single
    # all-non-support run yields sel = N, area2 = 2*NS-2 > threshold,
    # so the empty fill mask is selected)
    any_valid = valid.any(axis=1)
    sel = jnp.where(any_valid, sel, jnp.int32(N))
    area2_sel = jnp.where(any_valid, area2_sel, jnp.int32(2 * NS - 2))
    return sel, area2_sel


def _stats_sort(packed: jnp.ndarray, K: int, NS: int, N: int):
    """Per-component statistics via ONE u16 sort + prefix scans (the
    pre-histogram path; kept for cross-validation and as a fallback).
    Run order within a key is irrelevant (only run totals are used)."""
    (spk16,) = lax.sort(
        (packed.astype(jnp.uint16),), dimension=1, num_keys=1)
    spk = spk16.astype(jnp.int32)
    sk = spk >> 2

    nxt = jnp.concatenate([sk[:, 1:], jnp.full((K, 1), -1, sk.dtype)], 1)
    run_end = sk != nxt
    pos1 = lax.broadcasted_iota(jnp.int32, (K, NS), 1) + 1

    # one packed cumsum carries both the masked count (C, low 16 bits)
    # and the boundary count (B, high bits); each <= N = 2^12
    cum_cb = jnp.cumsum(((spk >> 1) & 1) + ((spk & 1) << 16), axis=1)

    def prev_run(v):
        m = lax.cummax(jnp.where(run_end, v, 0), axis=1)
        return jnp.concatenate([jnp.zeros((K, 1), m.dtype), m[:, :-1]], 1)

    cb = cum_cb - prev_run(cum_cb)
    C = cb & 0xFFFF
    Bc = cb >> 16
    # F (support count of the run) = run length, from run extents alone
    F = pos1 - prev_run(pos1)

    # area surrogate x2 (integer): 2*contourArea = 2F - B - 2
    area2 = 2 * F - Bc - 2
    valid = run_end & (C > 0) & (sk < N)
    key = jnp.where(valid, jnp.maximum(area2, 0) * N + sk, jnp.int32(-1))
    i_sel = jnp.argmax(key, axis=1)
    sel = jnp.take_along_axis(sk, i_sel[:, None], 1)[:, 0]          # [K]
    area2_sel = jnp.take_along_axis(area2, i_sel[:, None], 1)[:, 0]
    return sel, area2_sel
