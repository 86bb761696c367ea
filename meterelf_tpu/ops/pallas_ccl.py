"""Fused Pallas TPU kernel for the connected-component propagation of
ops/components.analyze_batch.

The XLA formulation round-trips ~80 scan/reduce_window ops through HBM
(~33 MB each at B=512, measured ~290 GB/s effective -> ~19 ms/batch).
This kernel keeps a group of windows VMEM-resident and runs every
propagation pass on-chip; only the input bits and the final owner-key
raster touch HBM.

Layout: window PAIRS are packed side by side in XLA ([M, 64, 128], one
transpose) so in-kernel rows use the full 128-lane width; a program
processes GP pairs as one [GP*64, 128] array. All scans and 3x3
neighborhoods are 64-BLOCK-SEGMENTED (masked log-shifts), so nothing
ever leaks between windows regardless of mask geometry.

Algorithms are identical to ops/components.py (same pass structure and
iteration counts, same monotone-offset segmented scans); see that module
for the cv2-semantics rationale. Reference: meterelf/_reading.py:132-148.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .components import K_LABEL_HYBRID, K_OUTSIDE_HYBRID, K_FILL

W = 64            # window size
N = W * W         # flat index bound; BIG label
GP = 8            # window pairs per program
_SEG_BASE = 8192
_GLUE = os.environ.get("METERELF_CCL_GLUE", "both")
                  # "both": 3x3 glue (min3x3 + any4) in BOTH halves of a
                  # lockstep pair (the round-3 schedule). "fwd": glue in
                  # the forward half only — the reverse half runs the
                  # segmented sweeps alone (~38% cheaper). Any glue
                  # schedule reaches the SAME unique fixpoint, and the
                  # convergence certificate is schedule-independent (a
                  # no-op pair includes a no-op glue), so converged
                  # windows are bit-identical; only non-converged
                  # (capped) partial states can differ, and those route
                  # to the rescue graph either way. Perf A/B knob.


def _iotas(S, L=128):
    sub = lax.broadcasted_iota(jnp.int32, (S, L), 0) % jnp.int32(W)
    lane = lax.broadcasted_iota(jnp.int32, (S, L), 1) % jnp.int32(W)
    return sub, lane


def _shift_prev(x, s, axis, S):
    """x shifted so position i sees position i-s (cyclic; callers mask)."""
    return pltpu.roll(x, s, axis)


def _shift_next(x, s, axis, S):
    """Position i sees position i+s (cyclic; callers mask)."""
    size = x.shape[axis]
    return pltpu.roll(x, size - s, axis)


def _blk_scan(x, axis, reverse, op, S, sub, lane, nsteps=6):
    """64-block-segmented prefix (or suffix) scan with operator `op`
    (max or add), via masked log-shifts. Out-of-block contributions are
    masked off, so each 64-run of a row/column scans independently."""
    idx = sub if axis == 0 else lane
    for b in range(nsteps):
        s = 1 << b
        if not reverse:
            shifted = _shift_prev(x, s, axis, S)
            ok = idx >= jnp.int32(s)
        else:
            shifted = _shift_next(x, s, axis, S)
            ok = idx < jnp.int32(W - s)
        x = jnp.where(ok, op(x, shifted), x)
    return x


def _seg_min_sweep(v, rids, S, sub, lane):
    """Four segmented-cummin sweeps (fwd/rev x lane/sublane) using
    precomputed run ids; the monotone-offset transform turns each into
    one blocked prefix-max."""
    for (axis, reverse), rid in rids:
        vp = rid * jnp.int32(_SEG_BASE) + (jnp.int32(_SEG_BASE - 1) - v)
        vp = _blk_scan(vp, axis, reverse, jnp.maximum, S, sub, lane)
        v = jnp.int32(_SEG_BASE - 1) - (vp - rid * jnp.int32(_SEG_BASE))
    return v


_RIDMM = os.environ.get("METERELF_CCL_RIDMM", "1") != "0"
                  # run-id prologue on the MXU (triangular matmuls)
                  # instead of 12 masked log-shift VPU steps; the CCL
                  # kernel is otherwise VPU-bound with an idle MXU.
                  # Env knob for A/B only.


def _blk_cumsum_mm(tr_row, tr_col, S, L):
    """Blocked (64-segmented) inclusive cumsums of the 0/1 transition
    indicators as triangular i8 matmuls. Prefix sums are matmuls with a
    block-diagonal triangular selector, so the run-id prologue rides
    the otherwise-idle MXU instead of the VPU log-shift ladder; values
    are <= 63 so i8 operands with i32 accumulation are exact."""
    i8 = jnp.int8
    i32 = jnp.int32
    rl = lax.broadcasted_iota(i32, (L, L), 0)
    cl = lax.broadcasted_iota(i32, (L, L), 1)
    tl = ((rl <= cl) & ((rl >> 6) == (cl >> 6))).astype(i8)
    rs = lax.broadcasted_iota(i32, (S, S), 0)
    cs = lax.broadcasted_iota(i32, (S, S), 1)
    ts = ((cs <= rs) & ((rs >> 6) == (cs >> 6))).astype(i8)
    fr = lax.dot_general(tr_row.astype(i8), tl,
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=i32)
    fc = lax.dot_general(ts, tr_col.astype(i8),
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=i32)
    return fr, fc


def _make_transition_rids(dom, S, sub, lane):
    """Run ids whose runs are maximal spans of CONSTANT `dom` (bool)
    within each 64-block — the segmentation the lockstep label+outside
    field needs: every cell belongs to exactly one run, label runs and
    background runs never mix. A valid rid only needs (a) constancy
    within each run and (b) strict monotone increase across runs IN
    SCAN ORDER — the sweeps use it purely as a segment offset. The
    forward prefix-sum of the transition indicator (cell differs from
    its scan predecessor) satisfies both forward; its NEGATION
    satisfies both in the reverse scan (crossing a transition while
    the index decreases lowers the forward count, so -fwd rises). Two
    blocked cumsums cover all four directions."""
    d = dom.astype(jnp.int32)
    tr_row = jnp.where(lane >= jnp.int32(1),
                       d ^ _shift_prev(d, 1, 1, S), jnp.int32(0))
    tr_col = jnp.where(sub >= jnp.int32(1),
                       d ^ _shift_prev(d, 1, 0, S), jnp.int32(0))
    if _RIDMM:
        fr, fc = _blk_cumsum_mm(tr_row, tr_col, S, lane.shape[1])
    else:
        fr = _blk_scan(tr_row, 1, False, jnp.add, S, sub, lane)
        fc = _blk_scan(tr_col, 0, False, jnp.add, S, sub, lane)
    return [
        ((1, False), fr),
        ((1, True), -fr),
        ((0, False), fc),
        ((0, True), -fc),
    ]


def _min3x3(x, S, sub, lane, big):
    """Blocked 3x3 min: out-of-window neighbors read as `big`."""
    b = jnp.int32(big)
    up = jnp.where(sub < jnp.int32(W - 1), _shift_next(x, 1, 0, S), b)
    dn = jnp.where(sub >= jnp.int32(1), _shift_prev(x, 1, 0, S), b)
    r = jnp.minimum(x, jnp.minimum(up, dn))
    lf = jnp.where(lane < jnp.int32(W - 1), _shift_next(r, 1, 1, S), b)
    rt = jnp.where(lane >= jnp.int32(1), _shift_prev(r, 1, 1, S), b)
    return jnp.minimum(r, jnp.minimum(lf, rt))


def _any4(x, S, sub, lane):
    # Mosaic cannot rotate i1 vectors; ride i32 0/1 with max as OR
    xi = x.astype(jnp.int32)
    z = jnp.int32(0)
    up = jnp.where(sub < jnp.int32(W - 1), _shift_next(xi, 1, 0, S), z)
    dn = jnp.where(sub >= jnp.int32(1), _shift_prev(xi, 1, 0, S), z)
    lf = jnp.where(lane < jnp.int32(W - 1), _shift_next(xi, 1, 1, S), z)
    rt = jnp.where(lane >= jnp.int32(1), _shift_prev(xi, 1, 1, S), z)
    return (up + dn + lf + rt) > 0


def _any8(x, S, sub, lane):
    xi = x.astype(jnp.int32)
    z = jnp.int32(0)
    up = jnp.where(sub < jnp.int32(W - 1), _shift_next(xi, 1, 0, S), z)
    dn = jnp.where(sub >= jnp.int32(1), _shift_prev(xi, 1, 0, S), z)
    ri = jnp.maximum(xi, jnp.maximum(up, dn))
    lf = jnp.where(lane < jnp.int32(W - 1), _shift_next(ri, 1, 1, S), z)
    rt = jnp.where(lane >= jnp.int32(1), _shift_prev(ri, 1, 1, S), z)
    return jnp.maximum(ri, jnp.maximum(lf, rt)) > 0


def _run_until(k_max: int, body, x0, reduce_eq):
    """Iterate body at most k_max times, exiting as soon as an iteration
    is a no-op. Propagation passes are idempotent at their fixpoint, so
    the result is bit-identical to always running k_max passes — but the
    corpus typically converges in 1-3, and the while exits there.

    Returns (x_final, red_i32): red = reduce_eq(elementwise "last pass
    was a no-op") — the per-window convergence evidence, matching the
    XLA path's (x_cap == x_{cap-1}) flag. The reduction runs INSIDE the
    step so the while carries the small [grp, lanes] summary instead of
    a full [S, lanes] eq raster: the big carry measurably taxed every
    iteration (docs/performance.md "pass-count economics")."""
    red0 = reduce_eq(jnp.zeros_like(x0, jnp.int32))

    def cond(c):
        i, done, _, _ = c
        return (i < jnp.int32(k_max)) & jnp.logical_not(done)

    def step(c):
        i, _, x, _ = c
        nx = body(x)
        red = reduce_eq((nx == x).astype(jnp.int32))
        done = jnp.min(red) > 0
        return (i + jnp.int32(1), done, nx, red)

    _, _, xf, redf = lax.while_loop(
        cond, step, (jnp.int32(0), jnp.bool_(False), x0, red0))
    return xf, redf


_SKIPREV = os.environ.get("METERELF_CCL_SKIPREV", "0") != "0"
                  # measured DEAD END, default off: skip the reverse
                  # half of a lockstep pair when the forward half was a
                  # no-op for every live phase (monotone propagation
                  # proves the rev half is a no-op too; bit-identical
                  # results/flags, asserted on chip). The per-pair
                  # forward-convergence check + in-kernel lax.cond cost
                  # MORE than the saved half: -2.0% empty / -3.2%
                  # corpus-like / -7.6% dense noise
                  # (experiments/ccl_skiprev_ab.py, v5e 2026-08-20).
                  # Kept behind the knob so it is not re-derived.


def _run_lockstep_pairs(k_lab: int, k_out: int, half_fwd, half_rev,
                        v0, masked, red_lab_fn, red_out_fn):
    """Run the label and outside-flood propagations IN LOCKSTEP on one
    packed field (labels on masked cells, outside flag on background
    cells): the two phases are independent computations, so sharing the
    per-half segmented sweeps halves the sweep work without changing
    either phase's per-half trajectory. Each phase FREEZES at its own
    cap (k_lab / k_out halves) so capped partial states — and the
    per-window convergence flags, latched at each phase's last executed
    pair — stay bit-identical to the sequential schedule the XLA path
    runs. Each iteration runs a forward-sweep half then a reverse-sweep
    half, both with STATIC roll amounts (selecting the direction at
    runtime forces dynamic rotates — measured 18% slower end-to-end,
    docs/performance.md). Convergence is detected on the SECOND half of
    each pair only: both phases move monotonically, so a no-op first
    half forces a no-op second half — nothing is missed, and the flag
    equals the XLA path's "last executed half changed nothing"
    (components.py _iterate runs the halves unrolled; both reach the
    same unique fixpoint). Equality is tested via subtraction because a
    direct == on i1-derived i32 casts gets canonicalized back to an
    i1-vector cmpi Mosaic cannot legalize."""
    assert k_lab % 2 == 0 and k_out % 2 == 0
    # the skip-rev certificate ("fwd half no-op => rev provably no-op")
    # requires the fwd half to contain the glue; the two experimental
    # knobs are mutually exclusive with the sound certificates as coded
    assert not (_SKIPREV and _GLUE == "fwd"), (
        "METERELF_CCL_SKIPREV and METERELF_CCL_GLUE=fwd cannot combine")
    PL, PO = k_lab // 2, k_out // 2
    i32 = jnp.int32
    z = jnp.zeros_like(v0, i32)
    red0l, red0o = red_lab_fn(z), red_out_fn(z)

    def cond(c):
        i, _, _, _, dl, do_ = c
        lab_live = (i < i32(PL)) & jnp.logical_not(dl)
        out_live = (i < i32(PO)) & jnp.logical_not(do_)
        return lab_live | out_live

    def step(c):
        i, v, redl, redo, dl, do_ = c
        lab_act = i < i32(PL)
        out_act = i < i32(PO)
        v1 = half_fwd(v)
        if _SKIPREV:
            # monotone propagation: a forward half that was a no-op for
            # every LIVE phase proves the reverse half would be one too
            # (a phase past its cap is frozen, a done phase cannot
            # move), so the certify pair pays one half instead of two.
            # Results, frozen partial states, and convergence flags are
            # bit-identical to the always-both schedule: the skipped
            # rev's eq raster would be all-ones exactly where eqf is.
            eqf = jnp.where((v1 - v) == i32(0), i32(1), i32(0))
            dl1 = jnp.min(red_lab_fn(jnp.where(masked, eqf, i32(1)))) > 0
            do1 = jnp.min(red_out_fn(jnp.where(masked, i32(1), eqf))) > 0
            skip = ((dl1 | ~lab_act | dl)
                    & (do1 | ~out_act | do_))

            def with_rev(v1):
                v2 = half_rev(v1)
                return v2, jnp.where((v2 - v1) == i32(0),
                                     i32(1), i32(0))

            v2, eq = lax.cond(skip, lambda x: (x, eqf), with_rev, v1)
        else:
            v2 = half_rev(v1)
            # SOUNDNESS of the certificate: right after a half's sweeps
            # the state is sweep-stable in those directions (cummin is
            # idempotent), so "rev half was a no-op" certifies a full
            # fixpoint ONLY if the rev half also contains the 3x3 glue.
            # Under the glue="fwd" schedule the rev half runs sweeps
            # alone, so the certificate must instead be "the WHOLE pair
            # was a no-op" (the pair contains one glue) — one pair later
            # sometimes, never wrong.
            base = v1 if _GLUE != "fwd" else v
            eq = jnp.where((v2 - base) == i32(0), i32(1), i32(0))
        # freeze each phase's cells once ITS cap is reached (the other
        # phase may still be sweeping)
        nv = jnp.where(masked,
                       jnp.where(lab_act, v2, v),
                       jnp.where(out_act, v2, v))
        redl2 = red_lab_fn(jnp.where(masked, eq, i32(1)))
        redo2 = red_out_fn(jnp.where(masked, i32(1), eq))
        redl = jnp.where(lab_act, redl2, redl)
        redo = jnp.where(out_act, redo2, redo)
        dl2 = dl | (lab_act & (jnp.min(redl2) > 0))
        do2 = do_ | (out_act & (jnp.min(redo2) > 0))
        return (i + i32(1), nv, redl, redo, dl2, do2)

    _, vf, redl, redo, _, _ = lax.while_loop(
        cond, step,
        (i32(0), v0, red0l, red0o, jnp.bool_(False), jnp.bool_(False)))
    return vf, redl, redo


def _ccl_kernel(bits_ref, okey_ref, conv_ref, *okflat_ref,
                caps=(K_LABEL_HYBRID, K_OUTSIDE_HYBRID, K_FILL),
                grp=GP, lanes=128, pack_closed=False):
    k_label, k_outside, k_fill = caps
    S = grp * W
    i32 = jnp.int32
    sub, lane = _iotas(S, lanes)
    idx = sub * i32(W) + lane          # per-window flat index
    BIG = i32(N)

    bits = bits_ref[...].reshape(S, lanes)
    masked = (bits & 1) != 0
    disk = (bits & 2) != 0

    # NOTE: moving this AND-reduce (and the conv output-lane packing
    # below) onto the MXU as 0/1 sums against block-diagonal selectors
    # measured NEUTRAL (0.67/0.89/1.86 vs 0.67/0.88/1.85 ms on
    # empty/blobs/noise) — unlike the run-id prologue, the convergence
    # reduce sits on the while-loop's critical path where the matmul
    # cannot overlap anything. Kept as the simpler rotate-min tree.
    def reduce_eq(eq):
        return jnp.min(eq.reshape(grp, W, lanes), axis=1)  # [grp, lanes]

    # ---- labels + outside flood, in lockstep on one packed field ----
    # masked cells carry the label (own flat idx, min-propagated,
    # always <= N-1); background cells carry the outside flag as
    # 0 = outside / 1 = not-reached (min-propagating 0 IS the
    # directional prefix-OR the sequential schedule ran). Runs are
    # segmented at every masked<->background transition, so the two
    # phases share the four segmented sweeps — the dominant per-pass
    # cost — while each phase's per-half trajectory (3x3 glue, sweep
    # order, caps) is exactly the sequential one.
    bg = ~masked
    rids = _make_transition_rids(masked, S, sub, lane)
    rids_fwd = [rids[0], rids[2]]   # row-fwd, col-fwd
    rids_rev = [rids[1], rids[3]]   # row-rev, col-rev

    def combined_half(rids_sub, v, glue=True):
        if glue:
            lab_view = jnp.where(masked, v, BIG)
            lab_new = jnp.minimum(v, _min3x3(lab_view, S, sub, lane, N))
            out_is = bg & (v == i32(0))
            grow = out_is | (bg & _any4(out_is, S, sub, lane))
            v = jnp.where(masked, lab_new,
                          jnp.where(grow, i32(0), v))
        return _seg_min_sweep(v, rids_sub, S, sub, lane)

    v0 = jnp.where(masked, idx,
                   jnp.where(disk, i32(1), i32(0)))
    field, red_lab, red_out = _run_lockstep_pairs(
        k_label, k_outside,
        functools.partial(combined_half, rids_fwd),
        functools.partial(combined_half, rids_rev,
                          glue=_GLUE != "fwd"),
        v0, masked, reduce_eq, reduce_eq)
    labels = jnp.where(masked, field, BIG)
    outside = bg & (field == i32(0))
    enclosed = bg & ~outside
    support = masked | enclosed

    # ---- hole ownership fill ----
    def fill_pass(own):
        return jnp.where(
            enclosed,
            jnp.minimum(own, _min3x3(own, S, sub, lane, N)), own)

    owner, red_fill = _run_until(
        k_fill, fill_pass, jnp.where(masked, labels, BIG), reduce_eq)

    # ---- outputs ----
    boundary = masked & _any8(outside, S, sub, lane)
    if pack_closed:
        # fused-stats packing: owner*8 + closed*4 + masked*2 + boundary
        # (ops/pallas_stats.stats_select_fused + angles.read_dial_from_okey
        # consume the closed bit so the needle-region raster and the
        # masked/closed dequads never materialize — pipeline/decode.py)
        closed = (bits >> 2) & 1
        okey = (jnp.where(support, owner, BIG) * 8 + closed * 4
                + masked.astype(i32) * 2 + boundary.astype(i32))
    else:
        okey = (jnp.where(support, owner, BIG) * 4
                + masked.astype(i32) * 2 + boundary.astype(i32))
    okey_ref[...] = okey

    if okflat_ref:
        # round-5 ask #6 A/B: emit the DEQUAD (per-window flat) layout
        # straight from VMEM as a second output, so the XLA transpose
        # that feeds the stats kernel disappears. Rows ordered
        # (image, dial, row): okflat[g*256 + d*64 + r, c] =
        # okey[g*64 + r, d*64 + c]; each dial's lanes are rotated to
        # origin first (Mosaic cannot slice at lane offsets).
        ofr = okflat_ref[0]
        D = lanes // W
        for d in range(D):
            rot = okey if d == 0 else pltpu.roll(
                okey, lanes - d * W, 1)
            for g in range(grp):
                ofr[(g * D + d) * W:(g * D + d) * W + W, :] = (
                    rot[g * W:(g + 1) * W, 0:W])

    # bool multi-reductions don't lower in Mosaic; use i32 min-reduce.
    # per-window convergence bit -> conv_ref lane b for window block b
    red = jnp.minimum(jnp.minimum(red_lab, red_out), red_fill)
    lane_r = lax.broadcasted_iota(i32, (grp, lanes), 1)
    lane_o = lax.broadcasted_iota(i32, (grp, 128), 1)
    conv = jnp.zeros((grp, 128), i32)
    for b in range(lanes // W):
        v = jnp.min(
            jnp.where(lane_r // i32(W) == i32(b), red, i32(1)),
            axis=1, keepdims=True)
        conv = jnp.where(lane_o == i32(b), v, conv)
    conv_ref[...] = conv


def propagate(masked: jnp.ndarray, disk: jnp.ndarray, *,
              interpret: bool = False, caps: tuple | None = None
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[K, W, W] bool masks -> (owner_key i32 [K, W, W], converged [K]).

    owner_key = owner*4 + masked*2 + boundary with owner = N for
    non-support pixels — exactly the packed key analyze_batch sorts.
    caps=(k_label, k_outside, k_fill) raises the pass bounds (the
    early-exit while loops make high caps pay-per-pass, not
    per-compile)."""
    K = masked.shape[0]
    assert masked.shape[1:] == (W, W)

    pairs_pad = (-K) % (2 * GP)  # pad K to a multiple of 2*GP
    Kp = K + pairs_pad
    if pairs_pad:
        z = jnp.zeros((pairs_pad, W, W), bool)
        masked = jnp.concatenate([masked, z], 0)
        disk = jnp.concatenate([disk, z], 0)
    M = Kp // 2

    bits = masked.astype(jnp.int32) + 2 * disk.astype(jnp.int32)
    bits2 = (bits.reshape(M, 2, W, W).transpose(0, 2, 1, 3)
             .reshape(M, W, 2 * W))

    kernel = functools.partial(
        _ccl_kernel, grp=GP, lanes=128,
        **({} if caps is None else {"caps": tuple(caps)}))
    with jax.enable_x64(False):
        okey2, conv2 = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((M * W, 128), jnp.int32),
                jax.ShapeDtypeStruct((M, 128), jnp.int32),
            ),
            grid=(M // GP,),
            in_specs=[
                pl.BlockSpec((GP, W, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((GP * W, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GP, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(bits2.reshape(M, W, 128))

    okey = (okey2.reshape(M, W, 2, W).transpose(0, 2, 1, 3)
            .reshape(Kp, W, W)[:K])
    conv = (conv2[:, :2] != 0).reshape(Kp)[:K]
    return okey, conv


GQ = int(os.environ.get("METERELF_CCL_GQ", "8"))
                  # images (window quads) per program in quad layout;
                  # >= 8 (the conv output block needs 8 sublanes:
                  # Mosaic block-shape rule). Env override is for
                  # perf experiments; 8 is the measured default.


def propagate_quads(bits_quads: jnp.ndarray, *, interpret: bool = False,
                    caps: tuple | None = None, pack_closed: bool = False,
                    emit_flat: bool = False) -> tuple:
    """Quad-layout propagation: [B, W, 4*W] i32 packed bits (bit 0 =
    masked, bit 1 = disk, bit 2 = closed; the windows kernel's native
    output, ops/pallas_windows.py) -> (okey [B, W, 4*W] i32,
    converged [B, 4]).

    okey packs owner*4 + masked*2 + boundary, or with pack_closed
    owner*8 + closed*4 + masked*2 + boundary (the fused-stats layout,
    ops/pallas_stats.stats_select_fused).

    Same kernel as propagate(), at 256 lanes: the 64-block-segmented
    machinery is layout-agnostic, so four windows ride one row."""
    B = bits_quads.shape[0]
    assert bits_quads.shape[1:] == (W, 4 * W)
    pad = (-B) % GQ
    Bp = B + pad
    if pad:
        bits_quads = jnp.concatenate(
            [bits_quads, jnp.zeros((pad, W, 4 * W), jnp.int32)], 0)

    kernel = functools.partial(
        _ccl_kernel, grp=GQ, lanes=4 * W, pack_closed=pack_closed,
        **({} if caps is None else {"caps": tuple(caps)}))
    out_shape = [
        jax.ShapeDtypeStruct((Bp * W, 4 * W), jnp.int32),
        jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((GQ * W, 4 * W), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((GQ, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if emit_flat:
        out_shape.append(
            jax.ShapeDtypeStruct((Bp * 4 * W, W), jnp.int32))
        out_specs.append(
            pl.BlockSpec((GQ * 4 * W, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            grid=(Bp // GQ,),
            in_specs=[
                pl.BlockSpec((GQ, W, 4 * W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
            interpret=interpret,
        )(bits_quads)
    okey, conv = outs[0], outs[1]
    res = (okey.reshape(Bp, W, 4 * W)[:B], (conv[:B, :4] != 0))
    if emit_flat:
        return res + (outs[2].reshape(Bp * 4, W, W)[:B * 4],)
    return res
