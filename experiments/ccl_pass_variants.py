"""Count passes-to-fixpoint of candidate CCL pass structures on the
REAL corpus window masks (both cameras), to pick the cheapest
structure. The min-label fixpoint is unique, so structure changes only
cost/pass-count and the caps, never the converged result.

Cost model (roll-op units/pass over the [512,256] program tile):
  min3x3                     ~4
  one seg sweep direction    ~6  (6 masked log-shift steps)
  any4                       ~4
So: current label pass = 4 + 4*6 = 28; variants below trade sweep
directions per pass for extra passes. Detect adds one pass.
"""
import sys
from glob import glob

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from meterelf_tpu.params import Params, DIAL_WIN
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.ops import color as color_ops
from meterelf_tpu.ops import template as template_ops
from meterelf_tpu.pipeline.decode import _dial_masks_from_packed_window

W = DIAL_WIN


def harvest(sdir):
    params = Params.load(f"{sdir}/params.yml")
    pa = params.arrays()
    files = sorted(glob(f"{sdir}/*.jpg"))
    crops, ok = jio.load_crops(files, params.meter_rect)
    crops = crops[ok]
    packed = jnp.asarray(jio.pack_crops(crops))
    b_pl = (packed & 255).astype(jnp.uint8)
    g_pl = ((packed >> 8) & 255).astype(jnp.uint8)
    r_pl = ((packed >> 16) & 255).astype(jnp.uint8)
    light = color_ops.lightness_from_planes(
        b_pl, g_pl, r_pl).astype(jnp.float32)
    tmean = (jnp.sum(pa.template_u8.astype(jnp.float64))
             / (pa.template_u8.size)).astype(jnp.float32)
    scores = template_ops.match_template_scores_matmul(
        light, pa.template_u8, tmean)
    max_val, mx, my = template_ops.locate(scores)
    found = np.asarray(max_val) >= params.dials_match_threshold
    D = pa.mask_full.shape[0]

    def window(img_pk, x, y, i):
        return jax.lax.dynamic_slice(
            img_pk, (y + pa.win_origin[i][1], x + pa.win_origin[i][0]),
            (W, W))

    masked, closed = jax.jit(jax.vmap(
        lambda img, x, y: jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_dial_masks_from_packed_window(
                window(img, x, y, i), pa.color_range[i],
                pa.centers_int[i], pa.mask_full[i], pa.hue_shift)
              for i in range(D)])))(packed, mx, my)
    masked = np.asarray(masked)[found].reshape(-1, W, W)
    disk = np.broadcast_to(
        np.asarray(pa.mask_full)[None], (int(found.sum()), D, W, W)
    ).reshape(-1, W, W)
    return masked, disk


def seg_cummin(v, wall, axis, reverse):
    """Segmented cummin along axis; runs are delimited by wall=True."""
    v = v.copy()
    n = v.shape[axis]
    sl = [slice(None)] * v.ndim

    def at(i):
        s = list(sl)
        s[axis] = i
        return tuple(s)

    rng = range(n - 2, -1, -1) if reverse else range(1, n)
    for i in rng:
        j = i + 1 if reverse else i - 1
        prev = np.where(wall[at(j)], 1 << 30, v[at(j)])
        v[at(i)] = np.minimum(v[at(i)], prev)
    return v


def min3x3(x, big):
    p = np.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=big)
    out = x.copy()
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out = np.minimum(out, p[:, dy:dy + W, dx:dx + W])
    return out


BIG = 1 << 30


def label_fixpoint_passes(masked, sweep_sched):
    """sweep_sched: function pass_index -> list of (axis, reverse) sweep
    directions to run that pass (min3x3 always runs). Returns passes to
    fixpoint (the detect pass is +1 on top of the returned count)."""
    K = masked.shape[0]
    idx = (np.arange(W)[:, None] * W + np.arange(W)[None, :]).astype(
        np.int64)
    lab = np.where(masked, idx[None], BIG)
    wall = ~masked
    for p in range(1, 100):
        nl = np.where(masked, np.minimum(lab, min3x3(lab, BIG)), BIG)
        for (axis, reverse) in sweep_sched(p - 1):
            nl = np.where(
                masked, seg_cummin(nl, wall, axis + 1, reverse), BIG)
        if np.array_equal(nl, lab):
            return p - 1  # previous pass already was the fixpoint
        lab = nl
    raise RuntimeError("no fixpoint in 99 passes")


ALL4 = [(1, False), (1, True), (0, False), (0, True)]
SCHEDULES = {
    "all4 (current)": lambda p: ALL4,
    "fwd2": lambda p: [(1, False), (0, False)],
    "alt-dir": lambda p: ([(1, False), (0, False)] if p % 2 == 0
                          else [(1, True), (0, True)]),
    "alt-axis": lambda p: ([(1, False), (1, True)] if p % 2 == 0
                           else [(0, False), (0, True)]),
    "rot1": lambda p: [ALL4[p % 4]],
    "rowsonly-then-all": lambda p: ([(1, False), (1, True)] if p == 0
                                    else ALL4),
    "none": lambda p: [],
}
UNITS = {"all4 (current)": 28, "fwd2": 16, "alt-dir": 16,
         "alt-axis": 16, "rot1": 10,
         "rowsonly-then-all": 28, "none": 4}

def seg_or(v, wall, axis, reverse):
    vi = v.astype(np.int64)
    return seg_cummin(-vi, wall, axis, reverse) < 0


def any4(x):
    p = np.pad(x, ((0, 0), (1, 1), (1, 1)))
    return (p[:, :-2, 1:-1] | p[:, 2:, 1:-1]
            | p[:, 1:-1, :-2] | p[:, 1:-1, 2:])


def outside_distances(masked, disk, sched, max_p=60):
    bg = ~masked
    out = bg & ~disk
    wall = masked
    K = masked.shape[0]
    dist = np.full(K, -1)
    for p in range(1, max_p):
        no = out | (bg & any4(out))
        for (axis, reverse) in sched(p - 1):
            no = seg_or(no, wall, axis + 1, reverse) & bg
        stable = (no == out).all(axis=(1, 2)) & (dist < 0)
        dist[stable] = p - 1
        if (dist >= 0).all():
            return dist
        out = no
    raise RuntimeError("no outside fixpoint")


def fill_distances(masked, disk):
    """Fill phase (min3x3 only over enclosed): corpus distances."""
    # reproduce labels + outside with the current schedule first
    K = masked.shape[0]
    idx = (np.arange(W)[:, None] * W + np.arange(W)[None, :]).astype(
        np.int64)
    lab = np.where(masked, idx[None], BIG)
    wall = ~masked
    for _ in range(12):
        nl = np.where(masked, np.minimum(lab, min3x3(lab, BIG)), BIG)
        for (axis, reverse) in ALL4:
            nl = np.where(
                masked, seg_cummin(nl, wall, axis + 1, reverse), BIG)
        if np.array_equal(nl, lab):
            break
        lab = nl
    bg = ~masked
    out = bg & ~disk
    for _ in range(12):
        no = out | (bg & any4(out))
        for (axis, reverse) in ALL4:
            no = seg_or(no, masked, axis + 1, reverse) & bg
        if (no == out).all():
            break
        out = no
    enclosed = bg & ~out
    own = np.where(masked, lab, BIG)
    dist = np.full(K, -1)
    for p in range(1, 60):
        nw = np.where(enclosed, np.minimum(own, min3x3(own, BIG)), own)
        stable = (nw == own).all(axis=(1, 2)) & (dist < 0)
        dist[stable] = p - 1
        if (dist >= 0).all():
            return dist
        own = nw
    raise RuntimeError("no fill fixpoint")


if __name__ == "__main__":
    ms, ds = [], []
    for sdir in ("/root/reference/sample-images1",
                 "/root/reference/sample-images2"):
        m, d = harvest(sdir)
        ms.append(m)
        ds.append(d)
    masked = np.concatenate(ms)
    diskb = np.concatenate(ds)
    print(f"{masked.shape[0]} corpus windows")

    for name in ("all4 (current)", "alt-dir", "rot1"):
        sched = SCHEDULES[name]
        per = []
        for i in range(0, masked.shape[0], 128):
            per.append(outside_distances(
                masked[i:i + 128], diskb[i:i + 128], sched))
        d = np.concatenate(per)
        print(f"OUTSIDE {name:16s} passes mean {d.mean():5.2f} "
              f"max {d.max():2d}")
    per = []
    for i in range(0, masked.shape[0], 128):
        per.append(fill_distances(masked[i:i + 128], diskb[i:i + 128]))
    d = np.concatenate(per)
    print(f"FILL min3x3-only     passes mean {d.mean():5.2f} "
          f"max {d.max():2d}")
    for name, sched in SCHEDULES.items():
        # per-window pass counts: run per window for exact max/mean
        counts = label_fixpoint_passes_batch = []
        # batch-level: fixpoint when EVERY window stops changing is what
        # the kernel's per-program early exit sees (8 quads/program);
        # report the distribution of per-window fixpoint distances.
        per = []
        CH = 64
        for i in range(0, masked.shape[0], CH):
            sub = masked[i:i + CH]
            # distance per window: run batch, track first no-change pass
            K = sub.shape[0]
            idx = (np.arange(W)[:, None] * W
                   + np.arange(W)[None, :]).astype(np.int64)
            lab = np.where(sub, idx[None], BIG)
            wall = ~sub
            dist = np.full(K, -1)
            prev = lab
            for p in range(1, 60):
                nl = np.where(sub, np.minimum(
                    lab, min3x3(lab, BIG)), BIG)
                for (axis, reverse) in sched(p - 1):
                    nl = np.where(
                        sub, seg_cummin(nl, wall, axis + 1, reverse),
                        BIG)
                stable = (nl == lab).all(axis=(1, 2)) & (dist < 0)
                dist[stable] = p - 1
                if (dist >= 0).all():
                    break
                lab = nl
            per.append(dist)
        dist = np.concatenate(per)
        u = UNITS[name]
        mean_cost = (dist.mean() + 1) * u
        max_cost = (dist.max() + 1) * u
        print(f"{name:20s} passes mean {dist.mean():5.2f} max "
              f"{dist.max():2d} | cost/window mean {mean_cost:6.1f} "
              f"max {max_cost:6.1f} units")
