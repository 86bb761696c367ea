"""Micro-profile of the Pallas correlation scorer: where do the 40ms go?

Variants:
  full     — the shipping kernel
  noroll   — matmuls + masked sum only (bounds the roll cost)
  nomm     — rolls on a constant rx (bounds the matmul cost)
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
from meterelf_tpu.ops import pallas_match as pm

B = 512
rng = np.random.default_rng(0)
L = rng.integers(0, 256, (B, 250, 250)).astype(np.float32)
T = rng.integers(0, 256, (119, 188)).astype(np.uint8)


def variant_kernel(lt_ref, t_ref, out_ref, *, ow, oh, th, mode):
    i32 = jnp.int32
    lane_r = lax.broadcasted_iota(jnp.int32, (pm.H_PAD, pm.R_PAD), 1)
    valid = lane_r < i32(th)
    t_bf16 = t_ref[:].astype(jnp.bfloat16)
    lt_bf16 = lt_ref[:].astype(jnp.bfloat16)
    cols = []
    rx0 = jnp.zeros((pm.H_PAD, pm.R_PAD), jnp.float32)
    for x in range(ow):
        if mode in ("full", "noroll"):
            sl = lt_bf16[x:x + pm.K_PAD, :]
            rx = lax.dot_general(
                sl, t_bf16, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            rx = rx0 + jnp.float32(x)
        if mode in ("full", "nomm"):
            for b in range(7):
                shift = 1 << b
                rolled = pltpu.roll(rx, i32(pm.H_PAD - shift), 0)
                rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        col = jnp.sum(jnp.where(valid, rx, jnp.float32(0.0)),
                      axis=1, keepdims=True)
        cols.append(col[:oh, :])
    out_ref[...] = jnp.concatenate(cols, axis=1)


def run(mode):
    oh_pad, ow, th = 136, 63, 119
    lt = jnp.swapaxes(jnp.asarray(L), 1, 2)
    lt_pad = jnp.zeros((B, pm.W_PAD, pm.H_PAD), jnp.float32)
    lt_pad = lt_pad.at[:, :250, :250].set(lt).reshape(B * pm.W_PAD, pm.H_PAD)
    t_pad = jnp.zeros((pm.R_PAD, pm.K_PAD), jnp.float32)
    t_pad = t_pad.at[:119, :188].set(jnp.asarray(T, jnp.float32))

    kern = functools.partial(variant_kernel, ow=ow, oh=oh_pad, th=th,
                             mode=mode)

    @jax.jit
    def f(lt_pad, t_pad):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B * oh_pad, ow), jnp.float32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((pm.W_PAD, pm.H_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.R_PAD, pm.K_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((oh_pad, ow), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(lt_pad, t_pad)
        return out.sum()

    r = float(f(lt_pad, t_pad))
    ts = []
    for _ in range(5):
        t0 = time.time()
        r = float(f(lt_pad, t_pad))
        ts.append(time.time() - t0)
    print(f"{mode:8s} best {min(ts)*1e3:7.2f} ms  (checksum {r:.6g})")


with jax.enable_x64(False):
    for mode in ["full", "noroll", "nomm"]:
        run(mode)


def mm_reduce_kernel(lt_ref, t_ref, out_ref, *, ow, oh, th):
    """Replace lane-sum + 1-lane concat with an MXU reduction matmul:
    S += rx @ E_x, E_x[r, j] = (j == x) & (r < th)."""
    i32 = jnp.int32
    f32 = jnp.float32
    lane_r = lax.broadcasted_iota(jnp.int32, (pm.H_PAD, pm.R_PAD), 1)
    sub_r = lax.broadcasted_iota(jnp.int32, (pm.R_PAD, 128), 0)
    lane_j = lax.broadcasted_iota(jnp.int32, (pm.R_PAD, 128), 1)
    t_bf16 = t_ref[:].astype(jnp.bfloat16)
    lt_bf16 = lt_ref[:].astype(jnp.bfloat16)
    S = jnp.zeros((pm.H_PAD, 128), f32)
    for x in range(ow):
        sl = lt_bf16[x:x + pm.K_PAD, :]
        rx = lax.dot_general(
            sl, t_bf16, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32)
        for b in range(7):
            shift = 1 << b
            rolled = pltpu.roll(rx, i32(pm.H_PAD - shift), 0)
            rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        e = ((lane_j == i32(x)) & (sub_r < i32(th))).astype(f32)
        S = S + lax.dot_general(
            rx, e, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)
    out_ref[...] = S[:oh, :]


def run_mm():
    oh_pad, ow, th = 136, 63, 119
    lt = jnp.swapaxes(jnp.asarray(L), 1, 2)
    lt_pad = jnp.zeros((B, pm.W_PAD, pm.H_PAD), jnp.float32)
    lt_pad = lt_pad.at[:, :250, :250].set(lt).reshape(B * pm.W_PAD, pm.H_PAD)
    t_pad = jnp.zeros((pm.R_PAD, pm.K_PAD), jnp.float32)
    t_pad = t_pad.at[:119, :188].set(jnp.asarray(T, jnp.float32))
    kern = functools.partial(mm_reduce_kernel, ow=ow, oh=oh_pad, th=th)

    @jax.jit
    def f(lt_pad, t_pad):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B * oh_pad, 128), jnp.float32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((pm.W_PAD, pm.H_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.R_PAD, pm.K_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((oh_pad, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(lt_pad, t_pad)
        return out[:, :ow].sum(), out

    r, out = f(lt_pad, t_pad)
    r = float(r)
    ts = []
    for _ in range(5):
        t0 = time.time()
        rr, _ = f(lt_pad, t_pad)
        rr = float(rr)
        ts.append(time.time() - t0)
    print(f"{'mmreduce':8s} best {min(ts)*1e3:7.2f} ms  (checksum {r:.6g})")
    # exactness vs shipping kernel
    ref = pm.match_scores_pallas(
        jnp.asarray(L), jnp.asarray(T), jnp.float32(0.0))
    got = out.reshape(B, oh_pad, 128)[:, :132, :63]
    print("   max |diff| vs shipping:",
          float(jnp.max(jnp.abs(ref - got))))


with jax.enable_x64(False):
    run_mm()
