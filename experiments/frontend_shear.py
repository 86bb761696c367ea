"""Round-5 frontend epilogue attack: partial-shear correlation.

The shipping kernel's diagonal epilogue rolls+sums a [blk~120, 256] i32
block PER OUTPUT COLUMN (63 of them) — ~2 passes over ~30 vregs each,
the kernel's VPU bound (round-4 analysis: VPU-bound, 2.37x structural
data inflation because oh=132 exceeds one 128-lane vreg).

Idea: shear the RIGHT operand by j in [0, JG) lanes (JG rolled copies
of the per-x-group slice, K-order (j, c) j-major) and contract over
(j, c) in the matmul. Each bank row then holds a GROUP of JG template
rows, and the matmul emits group-partial diagonal sums already
y-aligned within the group:

    rx2[(d, r), y'] = sum_{j, c} T[JG*(NG-1-r)+j, c-d] * L'[y'+j, x+c]
    corr[y, x]      = sum_r rx2[(d, r), y + JG*(NG-1-r)]

so the per-column epilogue shrinks to an [NG, 256] strided roll
(stride JG, spread JG*(NG-1) < 128) + an NG-row sublane sum — JG x less
VPU data. The MXU work stays the same MAC count (bank rows collapse
th -> NG); round 4 proved the matmul is NOT the critical path
(experiments/frontend_xg_ab.py: a 14% K cut moved +-1.3% noise).

Variants: base (shipping), shear16 (JG=16, NG=8), shear8 (JG=8, NG=16).
Exactness asserted bit-identical on the full corpus batch + random
frames BEFORE timing.
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

from glob import glob
from meterelf_tpu.params import Params
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.ops import pallas_frontend as fe

B, REPS = 256, 16
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, _ = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
packed_np = jio.pack_crops(np.tile(crops_np, (reps_t, 1, 1, 1))[:B],
                           pad_hw=(fe.STAGE, fe.STAGE))
packed = jax.device_put(packed_np)
th, tw = pa.template_zm.shape
geom = fe.geom_for(params.meter_rect.height, params.meter_rect.width,
                   th, tw)
tmean = float(np.sum(pa.template_u8.astype(np.int64))) / (th * tw)


def shear_bank(template_u8, geom, jg, ng):
    """[xg*ng, jg*bank_k] i8: row (d, r) holds template-row group
    (ng-1-r) at column offset d; K = (j, c) j-major."""
    g = geom
    t = np.asarray(template_u8).astype(np.int32) - 128
    bank = np.zeros((g.xg * ng, jg * g.bank_k), np.int8)
    for d in range(g.xg):
        for r in range(ng):
            grp = ng - 1 - r
            for j in range(jg):
                s = jg * grp + j
                if s >= g.th:
                    continue
                bank[d * ng + r,
                     j * g.bank_k + d:j * g.bank_k + d + g.tw] = t[s]
    return jnp.asarray(bank)


def shear_core(img_ref, bank_ref, c1_ref, corr_ref, geom, jg, ng):
    i32, f32 = jnp.int32, jnp.float32
    g = geom
    STAGE, H_PAD, W_PAD = fe.STAGE, fe.H_PAD, fe.W_PAD
    v256 = img_ref[...]
    v = jnp.concatenate(
        [jnp.concatenate(
            [v256, jnp.zeros((H_PAD - STAGE, STAGE), jnp.int32)], axis=0),
         jnp.zeros((H_PAD, W_PAD - STAGE), jnp.int32)], axis=1)
    b_pl = (v256 & i32(255)).astype(f32)
    g_pl = ((v256 >> 8) & i32(255)).astype(f32)
    r_pl = ((v256 >> 16) & i32(255)).astype(f32)
    scale = f32(1.0) / f32(255.0)
    bs, gs, rs = b_pl * scale, g_pl * scale, r_pl * scale
    vmax = jnp.maximum(jnp.maximum(rs, gs), bs)
    vmin = jnp.minimum(jnp.minimum(rs, gs), bs)
    l256 = jnp.clip(jnp.round((vmax + vmin) * f32(0.5) * f32(255.0)),
                    f32(0.0), f32(255.0))
    l8 = (l256.astype(i32) - i32(128)).astype(jnp.int8)
    lt8 = jnp.concatenate(
        [jnp.transpose(l8), jnp.zeros((64, STAGE), jnp.int8)], axis=0)
    bank = bank_ref[...]

    for x32 in range(0, g.nx * g.xg, g.xg):
        sl = lt8[x32:x32 + g.bank_k, :]
        # sheared right operand: block j holds sl lane-rolled left by j.
        # Mosaic only rotates 32-bit data, so roll the 4-sublane-packed
        # i32 bitcast (lane rolls move whole words, preserving the
        # row->byte mapping) and bitcast back.
        w = pltpu.bitcast(sl, jnp.int32)         # [bank_k//4, 256] i32
        sh = jnp.concatenate(
            [sl] + [pltpu.bitcast(pltpu.roll(w, STAGE - j, 1), jnp.int8)
                    for j in range(1, jg)],
            axis=0)                              # [jg*bank_k, 256] i8
        rx = lax.dot_general(
            bank, sh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=i32)          # [xg*ng, 256] i32
        for d in range(min(g.xg, g.ow - x32)):
            blk = rx[d * ng:(d + 1) * ng, :]     # [ng, 256]
            # row r needs a lane roll by jg*r; tpu.dynamic_rotate only
            # honors stride=1 (stride=jg is silently a no-op on real
            # hardware — experiments/shear_probe.py), so decompose into
            # log2(ng) masked power-of-two rolls selected by r's bits
            rr = blk
            rid = lax.broadcasted_iota(jnp.int32, (ng, STAGE), 0)
            b = 1
            while b < ng:
                rolled = pltpu.roll(rr, jg * b, 1)
                rr = jnp.where((rid & b) != 0, rolled, rr)
                b *= 2
            corr_ref[x32 + d, :] = jnp.sum(rr, axis=0)
    corrT_raw = corr_ref[...][0:g.ow, :]
    # group form lands corr[y] at lane y + jg*(ng-1)
    corrT = pltpu.roll(corrT_raw, STAGE - jg * (ng - 1), 1).astype(f32)

    ob_r = lax.broadcasted_iota(i32, (g.ow_pad, STAGE + 64), 0)
    ob_c = lax.broadcasted_iota(i32, (g.ow_pad, STAGE + 64), 1)
    obank = ((ob_c >= ob_r) & (ob_c < ob_r + i32(g.tw))).astype(jnp.int8)
    rt = lax.dot_general(
        obank, lt8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=i32)
    cs = fe._prefix_sum(rt, 1)
    top = pltpu.roll(cs, STAGE - (g.th - 1), 1)
    bot = pltpu.roll(cs, 1, 1)
    ylp = lax.broadcasted_iota(i32, (g.ow_pad, STAGE), 1)
    boxT = (top - jnp.where(ylp >= 1, bot, i32(0)))[0:g.ow, :]
    scoresT = corrT + c1_ref[0] * boxT.astype(f32) + c1_ref[1]

    xr = lax.broadcasted_iota(i32, (g.ow, STAGE), 0)
    yl = lax.broadcasted_iota(i32, (g.ow, STAGE), 1)
    in_range = yl < i32(g.oh)
    neg = f32(-3.0e38)
    smask = jnp.where(in_range, scoresT, neg)
    max_val = jnp.max(smask)
    flat = yl * i32(g.ow) + xr
    cand = jnp.where(smask == max_val, flat, i32(g.oh * g.ow))
    sel2 = jnp.min(cand)
    my = sel2 // i32(g.ow)
    mx = sel2 % i32(g.ow)
    rot = pltpu.roll(v, i32(H_PAD) - my, 0)
    rot = pltpu.roll(rot, i32(W_PAD) - mx, 1)
    return max_val, mx, my, rot[0:fe.SW_H, 0:fe.SW_W]


def kernel_shear(img_ref, bank_ref, c1_ref, sw_ref, stat_ref, corr_ref,
                 *, geom, jg, ng):
    max_val, mx, my, sw = shear_core(img_ref, bank_ref, c1_ref,
                                     corr_ref, geom, jg, ng)
    sw_ref[...] = sw
    stat_ref[...] = fe._stat_tile(max_val, mx, my)


def run_shear(pk, jg, ng):
    img_pad = pk.reshape(B * fe.STAGE, fe.STAGE)
    c1 = fe._c1_for(jnp.asarray(pa.template_u8), tmean)
    with jax.enable_x64(False):
        bank = shear_bank(pa.template_u8, geom, jg, ng)
        sw, stat = pl.pallas_call(
            functools.partial(kernel_shear, geom=geom, jg=jg, ng=ng),
            out_shape=(
                jax.ShapeDtypeStruct((B * fe.SW_H, fe.SW_W), jnp.int32),
                jax.ShapeDtypeStruct((B * 8, 128), jnp.float32),
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((fe.STAGE, fe.STAGE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((geom.xg * ng, jg * geom.bank_k),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((fe.SW_H, fe.SW_W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((geom.nx * geom.xg, fe.STAGE),
                                       jnp.int32)],
        )(img_pad, bank, c1)
    return sw.reshape(B, fe.SW_H, fe.SW_W), stat.reshape(B, 8, 128)


def run_base(pk):
    # NOTE: no enable_x64(False) wrapper here — frontend_pallas scopes
    # it internally around the pallas trace only; wrapping the WHOLE
    # call truncates _c1_for's f64 c0-residual to f32 and shifts every
    # score by ~7 (a harness artifact that masqueraded as a kernel
    # mismatch for one full debugging round)
    mv, mx, my, sw = fe.frontend_pallas(
        pk, jnp.asarray(pa.template_u8), tmean,
        crop_hw=(params.meter_rect.height, params.meter_rect.width))
    return sw, mv, mx, my


if __name__ == "__main__":
    # exactness first: corpus batch + random frames
    sw0, mv0, mx0, my0 = jax.jit(run_base)(packed)
    rng = np.random.default_rng(7)
    rand_np = jio.pack_crops(
        rng.integers(0, 256, (B, 250, 250, 3), np.uint8),
        pad_hw=(fe.STAGE, fe.STAGE))
    rand = jax.device_put(rand_np)
    swr0, mvr0, mxr0, myr0 = jax.jit(run_base)(rand)
    for jg, ng in ((16, 8), (8, 16)):
        sw1, st1 = jax.jit(
            functools.partial(run_shear, jg=jg, ng=ng))(packed)
        c_sw = bool((np.asarray(sw0) == np.asarray(sw1)).all())
        c_mv = bool((np.asarray(mv0) == np.asarray(st1[:, 0, 0])).all())
        c_mx = bool((np.asarray(mx0) == np.asarray(
            st1[:, 0, 1].astype(np.int32))).all())
        c_my = bool((np.asarray(my0) == np.asarray(
            st1[:, 0, 2].astype(np.int32))).all())
        print(f"  jg={jg}: sw={c_sw} mv={c_mv} mx={c_mx} my={c_my}")
        if not c_mv:
            a = np.asarray(mv0)
            b = np.asarray(st1[:, 0, 0])
            bad = np.nonzero(a != b)[0]
            print(f"    mv diverges on {len(bad)}/{len(a)} images; "
                  f"first: img {bad[0]} base {a[bad[0]]} "
                  f"shear {b[bad[0]]}")
        if not c_mx:
            a = np.asarray(mx0)
            b = np.asarray(st1[:, 0, 1].astype(np.int32))
            bad = np.nonzero(a != b)[0]
            print(f"    mx diverges on {len(bad)} images; first: "
                  f"img {bad[0]} base {a[bad[0]]} shear {b[bad[0]]}")
        ok_corpus = c_sw and c_mv and c_mx and c_my
        swr1, str1 = jax.jit(
            functools.partial(run_shear, jg=jg, ng=ng))(rand)
        ok_rand = (
            bool((np.asarray(swr0) == np.asarray(swr1)).all())
            and bool((np.asarray(mvr0) == np.asarray(
                str1[:, 0, 0])).all()))
        print(f"shear jg={jg} exact: corpus={ok_corpus} rand={ok_rand}")

    def timed(fn):
        @jax.jit
        def rep(pk):
            def body(i):
                pkx = pk.at[:, 0, 0].set(pk[:, 0, 0] ^ i)
                out = fn(pkx)
                sw, st = out[0], out[1]
                st = (st if st.ndim == 3
                      else jnp.zeros((B, 8, 128), jnp.float32))
                return (sw.sum().astype(jnp.float32)
                        + st.sum().astype(jnp.float32))
            return lax.map(body, jnp.arange(REPS, dtype=jnp.int32)).sum()

        float(rep(packed))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(rep(packed))
            best = min(best, time.time() - t0)
        return best / REPS * 1000.0

    base_fn = lambda pk: jax.tree.map(
        lambda x: x, (run_base(pk)[0], jnp.zeros((B, 8, 128),
                                                 jnp.float32)))
    t_base = timed(lambda pk: (run_base(pk)[0],
                               jnp.zeros((1, 1, 1), jnp.float32)))
    print(f"base     : {t_base:7.3f} ms/{B} (incl. dispatch floor/REPS)")
    for jg, ng in ((16, 8), (8, 16)):
        t = timed(functools.partial(run_shear, jg=jg, ng=ng))
        print(f"shear{jg:2d}  : {t:7.3f} ms/{B}")
