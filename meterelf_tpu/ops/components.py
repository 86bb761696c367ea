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
    has_any: jnp.ndarray        # [] bool: masked image nonempty
    needle_region: jnp.ndarray  # [W, W] bool: reference's needle_mask
    converged: jnp.ndarray      # [] bool: all propagations reached fixpoint


_SEG_BASE = 8192  # > any window label value (W*W + 1)


def _seg_scan_min(vals: jnp.ndarray, wall: jnp.ndarray, axis: int,
                  reverse: bool) -> jnp.ndarray:
    """Segmented cummin along an axis (running min resets at walls).

    Implemented with one plain cummax via a monotone-offset transform:
    v' = run_id*BASE + (BASE-1-v). Later runs have strictly larger
    offsets, so a global cummax never leaks values across run
    boundaries, and within a run max(BASE-1-v) recovers min(v). One
    native cumsum + cummax — much cheaper than a tuple associative_scan."""
    axis = axis % vals.ndim
    if reverse:
        vals = jnp.flip(vals, axis)
        wall = jnp.flip(wall, axis)
    rid = jnp.cumsum(wall.astype(jnp.int32), axis=axis)
    vp = rid * _SEG_BASE + (_SEG_BASE - 1 - vals)
    m = lax.cummax(vp, axis=axis)
    out = (_SEG_BASE - 1) - (m - rid * _SEG_BASE)
    if reverse:
        out = jnp.flip(out, axis)
    return out


def _seg_scan_or(vals: jnp.ndarray, wall: jnp.ndarray, axis: int,
                 reverse: bool) -> jnp.ndarray:
    """Segmented cumulative OR along an axis (resets at walls); same
    monotone-offset cummax trick with 0/1 payloads."""
    axis = axis % vals.ndim
    if reverse:
        vals = jnp.flip(vals, axis)
        wall = jnp.flip(wall, axis)
    rid = jnp.cumsum(wall.astype(jnp.int32), axis=axis)
    vp = rid * 2 + vals.astype(jnp.int32)
    m = lax.cummax(vp, axis=axis)
    out = (m - rid * 2) > 0
    if reverse:
        out = jnp.flip(out, axis)
    return out


def _min3x3(x: jnp.ndarray, big: int) -> jnp.ndarray:
    return lax.reduce_window(
        x, jnp.int32(big), lax.min,
        window_dimensions=(3, 3), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
    )


def _any4(x: jnp.ndarray) -> jnp.ndarray:
    """OR of the 4-neighborhood (von Neumann), border = False."""
    up = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    dn = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    lf = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    rt = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    return up | dn | lf | rt


def _any8(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, False, lax.bitwise_or,
        window_dimensions=(3, 3), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
    )


def analyze(
    masked: jnp.ndarray,     # [W, W] bool: closed needle mask & dial mask
    closed: jnp.ndarray,     # [W, W] bool: closed needle mask (unmasked)
    disk: jnp.ndarray,       # [W, W] bool: dial full-disk mask (static)
) -> ComponentResult:
    W = masked.shape[0]
    N = W * W
    BIG = N

    idx = (
        lax.broadcasted_iota(jnp.int32, (W, W), 0) * W
        + lax.broadcasted_iota(jnp.int32, (W, W), 1)
    )

    # ---- 8-connected component labels (min flat index per component) ----
    # hybrid propagation: one 3x3 min (glues diagonals) + segmented
    # row/col cummin sweeps (propagate through straight runs in one shot)
    labels0 = jnp.where(masked, idx, BIG)
    wall = ~masked

    def hybrid_pass(lab):
        lab = jnp.where(masked, jnp.minimum(lab, _min3x3(lab, BIG)), BIG)
        lab = _seg_scan_min(lab, wall, axis=-1, reverse=False)
        lab = _seg_scan_min(lab, wall, axis=-1, reverse=True)
        lab = _seg_scan_min(lab, wall, axis=-2, reverse=False)
        lab = _seg_scan_min(lab, wall, axis=-2, reverse=True)
        return jnp.where(masked, lab, BIG)

    labels = lax.fori_loop(
        0, K_LABEL_HYBRID, lambda _, l: hybrid_pass(l), labels0)
    labels_conv = jnp.all(
        jnp.where(masked, jnp.minimum(labels, _min3x3(labels, BIG)), BIG)
        == labels)

    # ---- outside background (bg 4-connected to beyond the dial disk) ----
    bg = ~masked
    outside0 = bg & ~disk
    bg_wall = masked

    def out_pass(out):
        out = out | (bg & _any4(out))
        out = _seg_scan_or(out, bg_wall, axis=-1, reverse=False)
        out = _seg_scan_or(out, bg_wall, axis=-1, reverse=True)
        out = _seg_scan_or(out, bg_wall, axis=-2, reverse=False)
        out = _seg_scan_or(out, bg_wall, axis=-2, reverse=True)
        return out & bg

    outside = lax.fori_loop(
        0, K_OUTSIDE_HYBRID, lambda _, o: out_pass(o), outside0)
    outside_conv = jnp.all((outside | (bg & _any4(outside))) == outside)
    enclosed = bg & ~outside
    support = masked | enclosed

    # ---- assign enclosed holes to their surrounding component ----
    owner0 = jnp.where(masked, labels, BIG)

    def fill_step(_, own):
        return jnp.where(enclosed, jnp.minimum(own, _min3x3(own, BIG)), own)

    owner = lax.fori_loop(0, K_FILL, fill_step, owner0)
    fill_conv = jnp.all(
        jnp.where(enclosed, jnp.minimum(owner, _min3x3(owner, BIG)), owner)
        == owner)
    converged = labels_conv & outside_conv & fill_conv

    # ---- per-component statistics via sort + prefix scans ----
    # (bincount-style scatter-adds are ~6x slower on TPU; a single sort
    # groups each component's pixels contiguously, and segmented sums
    # fall out of cumsums + a cummax trick for the previous run's total)
    boundary = masked & _any8(outside)
    key_pix = jnp.where(support, owner, N).ravel()
    payload = (
        masked.astype(jnp.int32)
        + 2 * support.astype(jnp.int32)
        + 4 * boundary.astype(jnp.int32)
    ).ravel()
    sk, sp = lax.sort((key_pix, payload), num_keys=1)

    cum_c = jnp.cumsum(sp & 1)
    cum_f = jnp.cumsum((sp >> 1) & 1)
    cum_b = jnp.cumsum((sp >> 2) & 1)
    nxt = jnp.concatenate([sk[1:], jnp.full((1,), -1, sk.dtype)])
    run_end = sk != nxt

    def run_total(cum):
        ends = jnp.where(run_end, cum, 0)
        m = lax.cummax(ends)
        prev = jnp.concatenate([jnp.zeros((1,), m.dtype), m[:-1]])
        return cum - prev

    F = run_total(cum_f)
    Bc = run_total(cum_b)
    C = run_total(cum_c)

    # area surrogate x2 (integer): 2*contourArea = 2F - B - 2
    area2 = 2 * F - Bc - 2
    valid = run_end & (C > 0) & (sk < N)
    key = jnp.where(valid, jnp.maximum(area2, 0) * N + sk, jnp.int32(-1))
    i_sel = jnp.argmax(key)
    sel = sk[i_sel]
    area2_sel = area2[i_sel]

    big_blob = area2_sel > 200  # contourArea > 100 (reference threshold)
    fill_sel = support & (owner == sel)
    needle_region = jnp.where(big_blob, fill_sel, closed)

    return ComponentResult(
        has_any=masked.any(),
        needle_region=needle_region,
        converged=converged,
    )
