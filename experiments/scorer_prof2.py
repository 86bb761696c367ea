"""Honest cost isolation for the Pallas scorer: each variant keeps the
real matmul (so nothing can be CSE'd across columns) and adds one more
stage. Timing deltas between consecutive variants = that stage's cost.

  mm        matmul only, elementwise accumulate
  mm_roll   + 7 masked log-shift rolls
  mm_roll_sum  + lane reduction to [256,1], accumulated (no concat)
  full      + per-column [136,1] concat (the shipping kernel's layout)
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
OW, OH_PAD, TH = 63, 136, 119


def kernel(lt_ref, t_ref, out_ref, *, stage):
    i32 = jnp.int32
    lane_r = lax.broadcasted_iota(jnp.int32, (pm.H_PAD, pm.R_PAD), 1)
    valid = lane_r < i32(TH)
    t_bf16 = t_ref[:].astype(jnp.bfloat16)
    lt_bf16 = lt_ref[:].astype(jnp.bfloat16)
    acc = jnp.zeros((pm.H_PAD, pm.R_PAD), jnp.float32)
    cols = []
    for x in range(OW):
        sl = lt_bf16[x:x + pm.K_PAD, :]
        rx = lax.dot_general(
            sl, t_bf16, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if stage >= 1:
            for b in range(7):
                shift = 1 << b
                rolled = pltpu.roll(rx, i32(pm.H_PAD - shift), 0)
                rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        if stage <= 1:
            acc = acc + rx
        elif stage == 2:
            col = jnp.sum(jnp.where(valid, rx, jnp.float32(0.0)),
                          axis=1, keepdims=True)
            acc = acc + col  # broadcast add, no concat
        else:
            col = jnp.sum(jnp.where(valid, rx, jnp.float32(0.0)),
                          axis=1, keepdims=True)
            cols.append(col[:OH_PAD, :])
    if stage <= 2:
        out_ref[...] = jnp.pad(acc[:OH_PAD, :OW], ((0, 0), (0, 0)))
    else:
        out_ref[...] = jnp.concatenate(cols, axis=1)


def run(stage, name):
    lt = jnp.swapaxes(jnp.asarray(L), 1, 2)
    lt_pad = jnp.zeros((B, pm.W_PAD, pm.H_PAD), jnp.float32)
    lt_pad = lt_pad.at[:, :250, :250].set(lt).reshape(B * pm.W_PAD, pm.H_PAD)
    t_pad = jnp.zeros((pm.R_PAD, pm.K_PAD), jnp.float32)
    t_pad = t_pad.at[:119, :188].set(jnp.asarray(T, jnp.float32))
    kern = functools.partial(kernel, stage=stage)

    @jax.jit
    def f(lt_pad, t_pad):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B * OH_PAD, OW), jnp.float32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((pm.W_PAD, pm.H_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.R_PAD, pm.K_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((OH_PAD, OW), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(lt_pad, t_pad)
        return out.sum()

    r = float(f(lt_pad, t_pad))
    ts = []
    for _ in range(5):
        t0 = time.time()
        r = float(f(lt_pad, t_pad))
        ts.append(time.time() - t0)
    print(f"{name:12s} best {min(ts)*1e3:7.2f} ms  (checksum {r:.6g})")


with jax.enable_x64(False):
    run(0, "mm")
    run(1, "mm_roll")
    run(2, "mm_roll_sum")
    run(3, "full")
