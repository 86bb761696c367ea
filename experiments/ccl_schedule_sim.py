"""Numpy simulation of CCL propagation SCHEDULES on needle-like masks:
how many sweep-units until the label fixpoint under

  pair   : the shipping alternation — (glue + row-fwd + col-fwd) then
           (glue + row-rev + col-rev); 1 half = glue + 2 directional
           sweeps (~2.0 units of sweep work + 1 glue)
  allmin : (glue + row-allmin + col-allmin); 1 pass = glue + 4
           directional sweeps' worth of work (~4 units + 1 glue), but
           spreads BOTH directions along each axis per pass

Unit model (from the on-chip anatomy, ccl_floor_anatomy): a
directional 6-step blocked sweep ~0.055 ms/256, a glue ~0.02, per-
iteration fixed (carry/reduce) ~0.01. The sim reports fixpoint
iteration counts and modeled loop cost for both schedules over mask
families: rotated-needle blobs (corpus-like), speckle, dense noise.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

W = 64
rng = np.random.default_rng(11)
yy, xx = np.mgrid[:W, :W]
disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2


def needle_mask():
    """Rotated-rectangle needle + hub, like a corpus dial window."""
    ang = rng.uniform(0, 2 * np.pi)
    cx, cy = 32 + rng.uniform(-3, 3), 32 + rng.uniform(-3, 3)
    dx, dy = np.cos(ang), np.sin(ang)
    u = (xx - cx) * dx + (yy - cy) * dy
    v = -(xx - cx) * dy + (yy - cy) * dx
    m = (u > -6) & (u < 22) & (np.abs(v) < 2.5)
    m |= (xx - cx) ** 2 + (yy - cy) ** 2 <= 4 ** 2
    if rng.random() < 0.5:   # speckle
        m |= rng.random((W, W)) < 0.003
    return m & disk


def masks(kind, n=256):
    if kind == "needle":
        return np.stack([needle_mask() for _ in range(n)])
    if kind == "noise":
        return (rng.random((n, W, W)) < 0.35) & disk
    raise ValueError(kind)


def seg_sweep(v, m, axis, reverse):
    """Segmented cummin along axis within runs of constant mask m."""
    v = v.copy()
    idxs = range(1, W) if not reverse else range(W - 2, -1, -1)
    for i in idxs:
        j = i - 1 if not reverse else i + 1
        if axis == 1:
            same = m[:, i] == m[:, j]
            v[:, i] = np.where(same, np.minimum(v[:, i], v[:, j]),
                               v[:, i])
        else:
            same = m[i, :] == m[j, :]
            v[i, :] = np.where(same, np.minimum(v[i, :], v[j, :]),
                               v[i, :])
    return v


def glue(v, m):
    big = W * W
    lab = np.where(m, v, big)
    p = np.pad(lab, 1, constant_values=big)
    n3 = np.minimum.reduce([
        p[a:a + W, b:b + W] for a in range(3) for b in range(3)])
    return np.where(m, np.minimum(v, n3), v)


def run_schedule(m, sched):
    """Return (halves_or_passes, sweep_units) to label fixpoint."""
    v = np.where(m, (yy * W + xx), W * W).astype(np.int64)
    units = 0
    it = 0
    while True:
        it += 1
        if sched == "pair":
            # one HALF per iteration, alternating direction
            fwd = (it % 2) == 1
            nv = glue(v, m)
            nv = seg_sweep(nv, m, 1, not fwd)
            nv = seg_sweep(nv, m, 0, not fwd)
            units += 2.4   # 2 sweeps + glue(0.4 sweep-equiv)
        else:
            nv = glue(v, m)
            nv = seg_sweep(nv, m, 1, False)
            nv = seg_sweep(nv, m, 1, True)
            nv = seg_sweep(nv, m, 0, False)
            nv = seg_sweep(nv, m, 0, True)
            units += 4.4   # 4 sweeps + glue
        if np.array_equal(nv, v):
            break
        v = nv
        if it > 60:
            break
    return it, units


if __name__ == "__main__":
    for kind in ("needle", "noise"):
        ms = masks(kind, 128)
        for sched in ("pair", "allmin"):
            its, units = zip(*(run_schedule(m, sched) for m in ms))
            print(f"{kind:6s} {sched:6s}: mean iters "
                  f"{np.mean(its):5.2f} max {max(its):2d}  "
                  f"mean units {np.mean(units):6.2f}", flush=True)
