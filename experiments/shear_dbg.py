"""Dump corrT from the base and shear frontend formulations for ONE
image and diff both against the numpy ground-truth correlation —
localizes which (x, y) cells the shear kernel gets wrong."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from glob import glob
from meterelf_tpu.params import Params
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.ops import pallas_frontend as fe
from experiments.frontend_shear import shear_bank

S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, _ = jio.load_crops(files[2:3], params.meter_rect)
packed_np = jio.pack_crops(crops_np, pad_hw=(fe.STAGE, fe.STAGE))
packed = jnp.asarray(packed_np)
th, tw = pa.template_zm.shape
geom = fe.geom_for(params.meter_rect.height, params.meter_rect.width,
                   th, tw)
g = geom
STAGE = fe.STAGE


def lchan(img):
    i32, f32 = jnp.int32, jnp.float32
    b_pl = (img & i32(255)).astype(f32)
    g_pl = ((img >> 8) & i32(255)).astype(f32)
    r_pl = ((img >> 16) & i32(255)).astype(f32)
    scale = f32(1.0) / f32(255.0)
    bs, gs, rs = b_pl * scale, g_pl * scale, r_pl * scale
    vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
    vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
    return jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                    f32(0.0), f32(255.0))


def base_kernel(img_ref, bank_ref, out_ref, corr_ref, *, geom):
    i32 = jnp.int32
    g = geom
    l256 = lchan(img_ref[...])
    l8 = (l256.astype(i32) - i32(128)).astype(jnp.int8)
    lt8 = jnp.concatenate(
        [jnp.transpose(l8), jnp.zeros((64, STAGE), jnp.int8)], axis=0)
    bank = bank_ref[...]
    for x32 in range(0, g.nx * g.xg, g.xg):
        sl = lt8[x32:x32 + g.bank_k, :]
        rx = lax.dot_general(
            bank, sl, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=i32)
        for d in range(min(g.xg, g.ow - x32)):
            blk = rx[d * g.blk:(d + 1) * g.blk, :]
            rr = pltpu.roll(blk, 0, 1, stride=1, stride_axis=0)
            corr_ref[x32 + d, :] = jnp.sum(rr, axis=0)
    out_ref[...] = pltpu.roll(corr_ref[...], STAGE - (g.th - 1), 1)


def shear_kernel(img_ref, bank_ref, out_ref, corr_ref, *, geom, jg, ng):
    i32 = jnp.int32
    g = geom
    l256 = lchan(img_ref[...])
    l8 = (l256.astype(i32) - i32(128)).astype(jnp.int8)
    lt8 = jnp.concatenate(
        [jnp.transpose(l8), jnp.zeros((64, STAGE), jnp.int8)], axis=0)
    bank = bank_ref[...]
    for x32 in range(0, g.nx * g.xg, g.xg):
        sl = lt8[x32:x32 + g.bank_k, :]
        w = pltpu.bitcast(sl, jnp.int32)
        sh = jnp.concatenate(
            [sl] + [pltpu.bitcast(pltpu.roll(w, STAGE - j, 1), jnp.int8)
                    for j in range(1, jg)],
            axis=0)
        rx = lax.dot_general(
            bank, sh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=i32)
        for d in range(min(g.xg, g.ow - x32)):
            blk = rx[d * ng:(d + 1) * ng, :]
            rr = blk
            rid = lax.broadcasted_iota(jnp.int32, (ng, STAGE), 0)
            b = 1
            while b < ng:
                rolled = pltpu.roll(rr, jg * b, 1)
                rr = jnp.where((rid & b) != 0, rolled, rr)
                b *= 2
            corr_ref[x32 + d, :] = jnp.sum(rr, axis=0)
    out_ref[...] = pltpu.roll(corr_ref[...], STAGE - jg * (ng - 1), 1)


def run(kern, bank, **kw):
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(kern, geom=geom, **kw),
            out_shape=jax.ShapeDtypeStruct((g.nx * g.xg, STAGE),
                                           jnp.int32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((STAGE, STAGE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bank.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g.nx * g.xg, STAGE),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((g.nx * g.xg, STAGE), jnp.int32)],
        )(packed.reshape(STAGE, STAGE), bank)
    return np.asarray(out)


if __name__ == "__main__":
    with jax.enable_x64(False):
        bank0 = fe._template_bank(jnp.asarray(pa.template_u8), geom)
        bank1 = shear_bank(pa.template_u8, geom, 16, 8)
    c_base = run(base_kernel, bank0)
    c_shear = run(shear_kernel, bank1, jg=16, ng=8)
    # numpy ground truth
    T = pa.template_u8.astype(np.int64) - 128
    img = packed_np[0].astype(np.int64)
    b = (img & 255).astype(np.float32)
    gg = ((img >> 8) & 255).astype(np.float32)
    r = ((img >> 16) & 255).astype(np.float32)
    scale = np.float32(1.0) / np.float32(255.0)
    bs, gs, rs = b * scale, gg * scale, r * scale
    vmax = np.maximum(np.maximum(rs, gs), bs)
    vmin = np.minimum(np.minimum(rs, gs), bs)
    l = np.clip(np.round((vmax + vmin) * np.float32(0.5)
                         * np.float32(255.0)), 0, 255).astype(np.int64) - 128
    ow, oh, th, tw = g.ow, g.oh, g.th, g.tw
    truth = np.zeros((ow, STAGE), np.int64)
    for x in range(ow):
        for y in range(oh):
            truth[x, y] = np.sum(T * l[y:y + th, x:x + tw])
    tb = truth[:, :oh]
    print("base  == truth:", np.array_equal(c_base[:ow, :oh], tb))
    print("shear == truth:", np.array_equal(c_shear[:ow, :oh], tb))
    if not np.array_equal(c_shear[:ow, :oh], tb):
        bad = np.argwhere(c_shear[:ow, :oh] != tb)
        print("bad cells:", len(bad), "of", ow * oh)
        print("first bad:", bad[:5].tolist())
        x0, y0 = bad[0]
        print("vals truth/base/shear:", tb[x0, y0],
              c_base[x0, y0], c_shear[x0, y0])
        xs = sorted(set(bad[:, 0].tolist()))
        ys = sorted(set(bad[:, 1].tolist()))
        print("bad x range:", xs[:5], "...", xs[-5:])
        print("bad y range:", ys[:5], "...", ys[-5:])

    d = c_base[:ow, :oh].astype(np.int64) - tb
    print("diff const?", np.unique(d).size, "uniq; first:", d[0, 0],
          d[10, 50], d[30, 100])
    # candidate explanations
    Tsum_shift = np.sum(T)            # sum of (T_u8 - 128)
    print("128*Tsum' =", 128 * Tsum_shift)
    box = np.zeros((ow, oh), np.int64)
    for x in range(ow):
        for y in range(oh):
            box[x, y] = np.sum(l[y:y + th, x:x + tw])
    print("diff == 128*box'?",
          np.array_equal(d, 128 * box))
