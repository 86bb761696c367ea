"""Quad-CCL FLOOR anatomy (round-5 ask #2): decompose the
input-independent cost — rid prologue, one lockstep pair, convergence
machinery, fill, epilogue — by timing kernel variants truncated at each
stage. All variants share the shipping kernel's building blocks
(imported from ops/pallas_ccl) so the numbers map 1:1 onto it.

Variants (cumulative):
  rids    : transition run-ids only
  pair1   : + ONE lockstep pair (no while, no reduces)
  pair1c  : + the convergence reduces and while carry (1 pair forced)
  nofill  : the real label/outside while loop, fill skipped, raw field
  noepi   : + fill loop; okey/boundary/conv epilogue skipped
  full    : shipping kernel (propagate_quads)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from meterelf_tpu.ops import pallas_ccl as C
from meterelf_tpu.ops.components import K_LABEL_HYBRID, K_OUTSIDE_HYBRID
from meterelf_tpu.ops.components import K_FILL

W, GQ = C.W, C.GQ
B = 256
N = W * W
rng = np.random.default_rng(7)
yy, xx = np.mgrid[:W, :W]
disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2


def quadify(masked, closed_disk):
    bits = masked.astype(np.int32) + 2 * closed_disk.astype(np.int32)
    return bits.reshape(B, 4, W, W).transpose(0, 2, 1, 3).reshape(
        B, W, 4 * W)


def make(kind):
    m = np.zeros((B * 4, W, W), bool)
    if kind == "blobs":
        for k in range(B * 4):
            cy, cx = rng.integers(16, 48, 2)
            a, b = rng.integers(3, 12, 2)
            m[k] = ((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2 <= 1.0
    m &= disk
    return quadify(m, np.broadcast_to(disk, (B * 4, W, W)))


def kernel_variant(bits_ref, okey_ref, conv_ref, *, stage, grp=GQ,
                   lanes=4 * W):
    i32 = jnp.int32
    S = grp * W
    sub, lane = C._iotas(S, lanes)
    idx = sub * i32(W) + lane
    BIG = i32(N)
    bits = bits_ref[...].reshape(S, lanes)
    masked = (bits & 1) != 0
    disk_b = (bits & 2) != 0
    bg = ~masked

    def reduce_eq(eq):
        return jnp.min(eq.reshape(grp, W, lanes), axis=1)

    if stage == "unpack":
        okey_ref[...] = masked.astype(i32) + disk_b.astype(i32) + idx
        conv_ref[...] = jnp.zeros((grp, 128), i32)
        return
    if stage == "trans":
        d = masked.astype(i32)
        tr_row = jnp.where(lane >= i32(1),
                           d ^ C._shift_prev(d, 1, 1, S), i32(0))
        tr_col = jnp.where(sub >= i32(1),
                           d ^ C._shift_prev(d, 1, 0, S), i32(0))
        okey_ref[...] = tr_row + tr_col + idx
        conv_ref[...] = jnp.zeros((grp, 128), i32)
        return
    if stage == "ridvpu":
        d = masked.astype(i32)
        tr_row = jnp.where(lane >= i32(1),
                           d ^ C._shift_prev(d, 1, 1, S), i32(0))
        tr_col = jnp.where(sub >= i32(1),
                           d ^ C._shift_prev(d, 1, 0, S), i32(0))
        fr = C._blk_scan(tr_row, 1, False, jnp.add, S, sub, lane)
        fc = C._blk_scan(tr_col, 0, False, jnp.add, S, sub, lane)
        okey_ref[...] = fr + fc
        conv_ref[...] = jnp.zeros((grp, 128), i32)
        return

    rids = C._make_transition_rids(masked, S, sub, lane)
    if stage == "rids":
        acc = jnp.zeros((S, lanes), i32)
        for (_, _), rid in rids:
            acc = acc + rid
        okey_ref[...] = acc
        conv_ref[...] = jnp.zeros((grp, 128), i32)
        return

    rids_fwd = [rids[0], rids[2]]
    rids_rev = [rids[1], rids[3]]

    def combined_half(rids_sub, v, glue=True):
        if glue:
            lab_view = jnp.where(masked, v, BIG)
            lab_new = jnp.minimum(v, C._min3x3(lab_view, S, sub, lane, N))
            out_is = bg & (v == i32(0))
            grow = out_is | (bg & C._any4(out_is, S, sub, lane))
            v = jnp.where(masked, lab_new, jnp.where(grow, i32(0), v))
        return C._seg_min_sweep(v, rids_sub, S, sub, lane)

    v0 = jnp.where(masked, idx, jnp.where(disk_b, i32(1), i32(0)))

    if stage == "pair1":
        v = combined_half(rids_rev, combined_half(rids_fwd, v0))
        okey_ref[...] = v
        conv_ref[...] = jnp.zeros((grp, 128), i32)
        return
    if stage == "pair1c":
        v1 = combined_half(rids_fwd, v0)
        v2 = combined_half(rids_rev, v1)
        eq = jnp.where((v2 - v1) == i32(0), i32(1), i32(0))
        redl = reduce_eq(jnp.where(masked, eq, i32(1)))
        redo = reduce_eq(jnp.where(masked, i32(1), eq))
        okey_ref[...] = v2
        conv_ref[...] = jnp.minimum(redl, redo)[:, :128]
        return

    field, red_lab, red_out = C._run_lockstep_pairs(
        K_LABEL_HYBRID, K_OUTSIDE_HYBRID,
        functools.partial(combined_half, rids_fwd),
        functools.partial(combined_half, rids_rev),
        v0, masked, reduce_eq, reduce_eq)
    labels = jnp.where(masked, field, BIG)
    outside = bg & (field == i32(0))
    enclosed = bg & ~outside
    support = masked | enclosed

    if stage == "nofill":
        okey_ref[...] = field
        conv_ref[...] = jnp.minimum(red_lab, red_out)[:, :128]
        return

    def fill_pass(own):
        return jnp.where(
            enclosed,
            jnp.minimum(own, C._min3x3(own, S, sub, lane, N)), own)

    owner, red_fill = C._run_until(
        K_FILL, fill_pass, jnp.where(masked, labels, BIG), reduce_eq)

    if stage == "noepi":
        okey_ref[...] = owner
        conv_ref[...] = jnp.minimum(
            jnp.minimum(red_lab, red_out), red_fill)[:, :128]
        return
    raise AssertionError(stage)


def run_variant(stage, bits_np):
    Bp = bits_np.shape[0]
    kernel = functools.partial(kernel_variant, stage=stage)
    bits = jnp.asarray(bits_np)

    def call(b):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((Bp * W, 4 * W), jnp.int32),
                    jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
                ),
                grid=(Bp // GQ,),
                in_specs=[pl.BlockSpec((GQ, W, 4 * W),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((GQ * W, 4 * W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((GQ, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
            )(b)

    return bits, call


REPS = 96


def timed(stage, bits_np, use_full=False):
    bits, call = run_variant("rids" if use_full else stage, bits_np)

    @jax.jit
    def rep(b):
        def body(i):
            bx = jnp.roll(b, i, axis=2)
            if use_full:
                o, c = C.propagate_quads(bx, pack_closed=True)
            else:
                o, c = call(bx)
            return o.sum() + c.sum()
        return lax.map(body, jnp.arange(REPS, dtype=jnp.int32)).sum()

    float(rep(bits))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(rep(bits))
        best = min(best, time.time() - t0)
    return best / REPS * 1000.0


if __name__ == "__main__":
    for kind in ("blobs",):
        bits_np = make(kind)
        print(f"-- {kind} --", flush=True)
        prev = 0.0
        for stage in ("unpack", "trans", "ridvpu", "rids", "pair1"):
            t = timed(stage, bits_np)
            print(f"  {stage:7s}: {t:6.3f} ms/256 (+{t - prev:6.3f})",
                  flush=True)
            prev = t

