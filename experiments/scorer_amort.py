"""Amortized comparison: shipping per-column scorer vs grouped-8
(shift-expanded template) scorer. See scorer_prof3.py for the grouped
design; this re-measures under lax.map (one dispatch)."""
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
from meterelf_tpu.ops import pallas_match as pm

B = 512
REPS = 16
rng = np.random.default_rng(0)
L = rng.integers(0, 256, (B, 250, 250)).astype(np.float32)
T = rng.integers(0, 256, (119, 188)).astype(np.uint8)
OW, OH, TH, TW = 63, 132, 119, 188
OH_PAD = 136
NJ = 8
NG = 8
KP = 200
RL = NJ * 128


def make_tbig(t_u8):
    tb = np.zeros((KP, RL), np.float32)
    for j in range(NJ):
        tb[j:j + TW, j * 128:j * 128 + TH] = t_u8.astype(np.float32).T
    return tb


def grouped_kernel(lt_ref, tb_ref, out_ref):
    i32 = jnp.int32
    f32 = jnp.float32
    lane_r = lax.broadcasted_iota(i32, (pm.H_PAD, RL), 1) % i32(128)
    sub = lax.broadcasted_iota(i32, (RL, 128), 0)
    lane = lax.broadcasted_iota(i32, (RL, 128), 1)
    d = lane - sub // i32(128)
    lt_bf16 = lt_ref[...].astype(jnp.bfloat16)
    tb_bf16 = tb_ref[...].astype(jnp.bfloat16)
    S = jnp.zeros((pm.H_PAD, 128), f32)
    for g in range(NG):
        sl = lt_bf16[8 * g:8 * g + KP, :]
        rx = lax.dot_general(
            sl, tb_bf16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        for b in range(7):
            shift = 1 << b
            rolled = pltpu.roll(rx, i32(pm.H_PAD - shift), 0)
            rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        e = (d == i32(8 * g)).astype(f32)
        S = S + lax.dot_general(
            rx, e, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)
    out_ref[...] = S[:OH_PAD, :]


def grouped_scores(lightness_f32, template_u8, tmean, tb):
    Bn = lightness_f32.shape[0]
    lt = jnp.swapaxes(lightness_f32, 1, 2)
    lt_pad = jnp.zeros((Bn, pm.W_PAD, pm.H_PAD), jnp.float32)
    lt_pad = lt_pad.at[:, :250, :250].set(lt).reshape(Bn * pm.W_PAD, pm.H_PAD)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            grouped_kernel,
            out_shape=jax.ShapeDtypeStruct((Bn * OH_PAD, 128), jnp.float32),
            grid=(Bn,),
            in_specs=[
                pl.BlockSpec((pm.W_PAD, pm.H_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KP, RL), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((OH_PAD, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(lt_pad, tb)
    corr = out.reshape(Bn, OH_PAD, 128)[:, :OH, :OW]
    cs = jnp.cumsum(jnp.cumsum(lightness_f32, axis=1), axis=2)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (1, 0)))
    box = (cs[:, TH:, TW:] - cs[:, :-TH, TW:]
           - cs[:, TH:, :-TW] + cs[:, :-TH, :-TW])
    return corr - jnp.float32(tmean) * box


Ld = jax.device_put(L)
Td = jax.device_put(T)
tbd = jax.device_put(make_tbig(T))


def timed(name, fn, *args):
    @jax.jit
    def rep(*a):
        return lax.map(
            lambda i: fn(a[0] + i.astype(jnp.float32), *a[1:]).sum(),
            jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(*args))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep(*args))
        ts.append(time.time() - t0)
    print(f"{name:12s} {min(ts)*1e3/REPS:7.2f} ms/rep  (r={r:.6g})")


with jax.enable_x64(False):
    timed("shipping", lambda l: pm.match_scores_pallas(
        l, Td, jnp.float32(117.25)), Ld)
    timed("grouped8", lambda l: grouped_scores(
        l, Td, jnp.float32(117.25), tbd), Ld)
    # parity
    a = pm.match_scores_pallas(Ld, Td, jnp.float32(117.25))
    b = grouped_scores(Ld, Td, jnp.float32(117.25), tbd)
    print("max |diff|:", float(jnp.max(jnp.abs(a - b))))


# decompose: prep (swapaxes+pad), kernel, boxsum
def prep(l):
    lt = jnp.swapaxes(l, 1, 2)
    lt_pad = jnp.zeros((B, pm.W_PAD, pm.H_PAD), jnp.float32)
    return lt_pad.at[:, :250, :250].set(lt).reshape(B * pm.W_PAD, pm.H_PAD)


def boxsum(l):
    cs = jnp.cumsum(jnp.cumsum(l, axis=1), axis=2)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (1, 0)))
    return (cs[:, TH:, TW:] - cs[:, :-TH, TW:]
            - cs[:, TH:, :-TW] + cs[:, :-TH, :-TW])


t_pad_np = np.zeros((pm.R_PAD, pm.K_PAD), np.float32)
t_pad_np[:119, :188] = T.astype(np.float32)
tp = jax.device_put(t_pad_np)
ltp = jax.device_put(np.asarray(prep(Ld)))

with jax.enable_x64(False):
    timed("prep_only", lambda l: prep(l).sum() * jnp.float32(1e-9), Ld)
    timed("boxsum_only", lambda l: boxsum(l).sum() * jnp.float32(1e-9), Ld)

    def kern_only(ltp_in, tp_in):
        return pm._corr_pallas(ltp_in, tp_in)[:, :OH, :OW].sum()

    @jax.jit
    def rep_k(ltp_in, tp_in):
        return lax.map(lambda i: kern_only(ltp_in + i.astype(jnp.float32),
                                           tp_in),
                       jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep_k(ltp, tp))
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = float(rep_k(ltp, tp))
        ts.append(time.time() - t0)
    print(f"{'kernel_only':12s} {min(ts)*1e3/REPS:7.2f} ms/rep")


from meterelf_tpu.ops.pallas_match2 import match_scores_pallas_fused

with jax.enable_x64(False):
    timed("fused_v2", lambda l: match_scores_pallas_fused(
        l, Td, jnp.float32(117.25)), Ld)
    a = pm.match_scores_pallas(Ld, Td, jnp.float32(117.25))
    c = match_scores_pallas_fused(Ld, Td, jnp.float32(117.25))
    print("v2 max |diff| vs v1:", float(jnp.max(jnp.abs(a - c))))
