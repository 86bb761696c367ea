"""Isolate which analyze_batch design choice regressed: pair packing,
u16 fill, u16 sort, native-reverse scans. Amortized (lax.map)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)
from meterelf_tpu.ops import components as C

K = 2048
W = 64
N = W * W
BIG = N
REPS = 16
rng = np.random.default_rng(0)
yy, xx = np.mgrid[:W, :W]
disk_np = ((yy - 32) ** 2 + (xx - 32) ** 2) <= 22 ** 2
base = rng.random((K, W, W)) < 0.25
masked_np = base & disk_np[None]
masked_d = jax.device_put(masked_np)
closed_d = jax.device_put(base)
disk_d = jax.device_put(np.broadcast_to(disk_np, (K, W, W)).copy())


def seg_min(vals, wall, axis, reverse, native_rev):
    axis = axis % vals.ndim
    if native_rev:
        rid = lax.cumsum(wall.astype(jnp.int32), axis=axis, reverse=reverse)
        vp = rid * 8192 + (8191 - vals)
        m = lax.cummax(vp, axis=axis, reverse=reverse)
        return 8191 - (m - rid * 8192)
    if reverse:
        vals = jnp.flip(vals, axis)
        wall = jnp.flip(wall, axis)
    rid = jnp.cumsum(wall.astype(jnp.int32), axis=axis)
    vp = rid * 8192 + (8191 - vals)
    m = lax.cummax(vp, axis=axis)
    out = 8191 - (m - rid * 8192)
    return jnp.flip(out, axis) if reverse else out


def seg_or(vals, wall, axis, reverse, native_rev):
    axis = axis % vals.ndim
    if native_rev:
        rid = lax.cumsum(wall.astype(jnp.int32), axis=axis, reverse=reverse)
        vp = rid * 2 + vals.astype(jnp.int32)
        m = lax.cummax(vp, axis=axis, reverse=reverse)
        return (m - rid * 2) > 0
    if reverse:
        vals = jnp.flip(vals, axis)
        wall = jnp.flip(wall, axis)
    rid = jnp.cumsum(wall.astype(jnp.int32), axis=axis)
    vp = rid * 2 + vals.astype(jnp.int32)
    m = lax.cummax(vp, axis=axis)
    out = (m - rid * 2) > 0
    return jnp.flip(out, axis) if reverse else out


def run_variant(masked, closed, disk, *, packed, u16_fill, u16_sort,
                native_rev, do_stats=True):
    if packed:
        M = K // 2
        pk = lambda a: (a.reshape(M, 2, W, W).transpose(0, 2, 1, 3)
                        .reshape(M, W, 2 * W))
        m2, d2 = pk(masked), pk(disk)
        Wc = 2 * W
    else:
        m2, d2 = masked, disk
        Wc = W
    idx = (lax.broadcasted_iota(jnp.int32, (W, Wc), 0) * W
           + lax.broadcasted_iota(jnp.int32, (W, Wc), 1) % W)
    labels = jnp.where(m2, idx, BIG)
    wall = ~m2
    for _ in range(C.K_LABEL_HYBRID):
        lab = jnp.where(m2, jnp.minimum(labels, C._min3x3(labels, BIG)), BIG)
        lab = seg_min(lab, wall, -1, False, native_rev)
        lab = seg_min(lab, wall, -1, True, native_rev)
        lab = seg_min(lab, wall, -2, False, native_rev)
        lab = seg_min(lab, wall, -2, True, native_rev)
        labels = jnp.where(m2, lab, BIG)
    bg = ~m2
    outside = bg & ~d2
    for _ in range(C.K_OUTSIDE_HYBRID):
        out = outside | (bg & C._any4(outside))
        out = seg_or(out, m2, -1, False, native_rev)
        out = seg_or(out, m2, -1, True, native_rev)
        out = seg_or(out, m2, -2, False, native_rev)
        out = seg_or(out, m2, -2, True, native_rev)
        outside = out & bg
    enclosed = bg & ~outside
    support = m2 | enclosed
    fdt = jnp.uint16 if u16_fill else jnp.int32
    owner = jnp.where(m2, labels, BIG).astype(fdt)
    for _ in range(C.K_FILL):
        owner = jnp.where(
            enclosed, jnp.minimum(owner, C._min3x3(owner, BIG)), owner)
    if not do_stats:
        return owner.astype(jnp.int32).sum() + support.sum()
    boundary = m2 & C._any8(outside)
    pk2 = (jnp.where(support, owner.astype(jnp.int32), N) * 4
           + m2.astype(jnp.int32) * 2 + boundary.astype(jnp.int32))
    if packed:
        M = K // 2
        pk2 = (pk2.reshape(M, W, 2, W).transpose(0, 2, 1, 3)
               .reshape(K, N))
    else:
        pk2 = pk2.reshape(K, N)
    if u16_sort:
        (s16,) = lax.sort((pk2.astype(jnp.uint16),), dimension=1, num_keys=1)
        spk = s16.astype(jnp.int32)
    else:
        (spk,) = lax.sort((pk2,), dimension=1, num_keys=1)
    sk = spk >> 2
    nxt = jnp.concatenate([sk[:, 1:], jnp.full((K, 1), -1, sk.dtype)], 1)
    run_end = sk != nxt
    pos1 = lax.broadcasted_iota(jnp.int32, (K, N), 1) + 1
    cum_cb = jnp.cumsum(((spk >> 1) & 1) + ((spk & 1) << 16), axis=1)

    def prev_run(v):
        m = lax.cummax(jnp.where(run_end, v, 0), axis=1)
        return jnp.concatenate([jnp.zeros((K, 1), m.dtype), m[:, :-1]], 1)

    cb = cum_cb - prev_run(cum_cb)
    Cc, Bc = cb & 0xFFFF, cb >> 16
    F = pos1 - prev_run(pos1)
    area2 = 2 * F - Bc - 2
    valid = run_end & (Cc > 0) & (sk < N)
    keyv = jnp.where(valid, jnp.maximum(area2, 0) * N + sk, -1)
    i_sel = jnp.argmax(keyv, axis=1)
    sel = jnp.take_along_axis(sk, i_sel[:, None], 1)[:, 0]
    return sel.sum()


def timed(name, **kw):
    f = functools.partial(run_variant, **kw)

    @jax.jit
    def rep(m, c, d):
        return lax.map(lambda i: f(m ^ (i % 2 == 1), c, d),
                       jnp.arange(REPS)).sum()

    r = float(rep(masked_d, closed_d, disk_d))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(masked_d, closed_d, disk_d))
        ts.append(time.time() - t0)
    print(f"{name:42s} {min(ts)*1e3/REPS:7.2f} ms/rep")


timed("new (pack+u16fill+u16sort+natrev)",
      packed=1, u16_fill=1, u16_sort=1, native_rev=1)
timed("pack+u16fill+u16sort+fliprev",
      packed=1, u16_fill=1, u16_sort=1, native_rev=0)
timed("pack+i32fill+u16sort+natrev",
      packed=1, u16_fill=0, u16_sort=1, native_rev=1)
timed("pack+u16fill+i32sort+natrev",
      packed=1, u16_fill=1, u16_sort=0, native_rev=1)
timed("nopack+u16fill+u16sort+natrev",
      packed=0, u16_fill=1, u16_sort=1, native_rev=1)
timed("nopack+i32fill+i32sort+fliprev (old-ish)",
      packed=0, u16_fill=0, u16_sort=0, native_rev=0)
timed("noSTATS pack+u16fill+natrev",
      packed=1, u16_fill=1, u16_sort=1, native_rev=1, do_stats=0)
timed("noSTATS nopack+i32fill+fliprev",
      packed=0, u16_fill=0, u16_sort=0, native_rev=0, do_stats=0)
