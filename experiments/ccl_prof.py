"""Sub-stage cost breakdown of ops/components.analyze (amortized under
lax.map; see stage_prof.py for why). Variants toggle each phase."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from meterelf_tpu.ops import components as C

B = 2048  # windows (512 images x 4 dials)
W = 64
REPS = 16
rng = np.random.default_rng(0)
# realistic-ish masks: random blobs inside a disk
yy, xx = np.mgrid[:W, :W]
disk = ((yy - 32) ** 2 + (xx - 32) ** 2) <= 24 ** 2
base = rng.random((B, W, W)) < 0.25
from scipy import ndimage  # noqa: E402  (scipy present? fallback below)


def close3(m):
    k = np.ones((1, 3, 3), bool)
    d = ndimage.binary_dilation(m, k)
    return ndimage.binary_erosion(d, k)


try:
    closed_np = close3(base)
except Exception:
    closed_np = base
masked_np = closed_np & disk[None]
closed = jax.device_put(closed_np)
masked = jax.device_put(masked_np)
disk_j = jax.device_put(np.broadcast_to(disk, (B, W, W)).copy())


def analyze_variant(masked, closed, disk, *, do_label, do_out, do_fill,
                    do_sort):
    Wn = masked.shape[0]
    N = Wn * Wn
    BIG = N
    idx = (lax.broadcasted_iota(jnp.int32, (Wn, Wn), 0) * Wn
           + lax.broadcasted_iota(jnp.int32, (Wn, Wn), 1))
    labels0 = jnp.where(masked, idx, BIG)
    wall = ~masked

    def hybrid_pass(lab):
        lab = jnp.where(masked, jnp.minimum(lab, C._min3x3(lab, BIG)), BIG)
        lab = C._seg_scan_min(lab, wall, axis=-1, reverse=False)
        lab = C._seg_scan_min(lab, wall, axis=-1, reverse=True)
        lab = C._seg_scan_min(lab, wall, axis=-2, reverse=False)
        lab = C._seg_scan_min(lab, wall, axis=-2, reverse=True)
        return jnp.where(masked, lab, BIG)

    labels = labels0
    if do_label:
        labels = lax.fori_loop(0, C.K_LABEL_HYBRID,
                               lambda _, l: hybrid_pass(l), labels0)

    bg = ~masked
    outside = bg & ~disk
    if do_out:
        bg_wall = masked

        def out_pass(out):
            out = out | (bg & C._any4(out))
            out = C._seg_scan_or(out, bg_wall, axis=-1, reverse=False)
            out = C._seg_scan_or(out, bg_wall, axis=-1, reverse=True)
            out = C._seg_scan_or(out, bg_wall, axis=-2, reverse=False)
            out = C._seg_scan_or(out, bg_wall, axis=-2, reverse=True)
            return out & bg

        outside = lax.fori_loop(0, C.K_OUTSIDE_HYBRID,
                                lambda _, o: out_pass(o), outside)
    enclosed = bg & ~outside
    support = masked | enclosed
    owner = jnp.where(masked, labels, BIG)
    if do_fill:
        owner = lax.fori_loop(
            0, C.K_FILL,
            lambda _, own: jnp.where(
                enclosed, jnp.minimum(own, C._min3x3(own, BIG)), own),
            owner)

    if not do_sort:
        return owner.sum() + support.sum() + outside.sum()

    boundary = masked & C._any8(outside)
    key_pix = jnp.where(support, owner, N).ravel()
    payload = (masked.astype(jnp.int32) + 2 * support.astype(jnp.int32)
               + 4 * boundary.astype(jnp.int32)).ravel()
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
    Cc = run_total(cum_c)
    area2 = 2 * F - Bc - 2
    valid = run_end & (Cc > 0) & (sk < N)
    key = jnp.where(valid, jnp.maximum(area2, 0) * N + sk, jnp.int32(-1))
    i_sel = jnp.argmax(key)
    sel = sk[i_sel]
    return sel + owner.sum()


def timed(name, **flags):
    f = jax.vmap(lambda m, c, d: analyze_variant(m, c, d, **flags))

    @jax.jit
    def rep(m, c, d):
        return lax.map(lambda i: f(m ^ (i % 2 == 1), c, d).sum(),
                       jnp.arange(REPS)).sum()

    r = float(rep(masked, closed, disk_j))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(masked, closed, disk_j))
        ts.append(time.time() - t0)
    print(f"{name:26s} {min(ts)*1e3/REPS:7.2f} ms/rep")


timed("nothing", do_label=0, do_out=0, do_fill=0, do_sort=0)
timed("label only", do_label=1, do_out=0, do_fill=0, do_sort=0)
timed("label+out", do_label=1, do_out=1, do_fill=0, do_sort=0)
timed("label+out+fill", do_label=1, do_out=1, do_fill=1, do_sort=0)
timed("full (with sort)", do_label=1, do_out=1, do_fill=1, do_sort=1)
