"""Prototype: 8-columns-per-matmul Pallas scorer.

The shipping kernel issues 63 small matmuls per image (32k total at
B=512) and is latency-bound (~35 ms regardless of which stages run —
see scorer_prof2). This version:

- builds T_big[k', j*128+r] = T[r, k'-j] for j in [0,8): one matmul
  computes the row-correlations for 8 consecutive output columns;
- slices SL at 8-aligned offsets (no sublane rotation on the slice);
- rolls the [256, 1024] result once per group (same total volume);
- reduces sum-over-r and places the 8 columns into output lanes with a
  single f32 selector matmul per group: S += rx @ E_g.

8 matmul pairs per image instead of 63 matmuls + 63 lane-sum/concats.
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
OW, OH, TH, TW = 63, 132, 119, 188
OH_PAD = 136
NJ = 8                      # columns per matmul group
NG = (OW + NJ - 1) // NJ    # 8 groups (last group: cols 56..62, j=7 unused)
KP = 200                    # slice depth: 188 + 8 shifts, multiple of 8
RL = NJ * 128               # T_big lane width


def make_tbig(t_u8):
    tb = np.zeros((KP, RL), np.float32)
    for j in range(NJ):
        tb[j:j + TW, j * 128:j * 128 + TH] = t_u8.astype(np.float32).T
    return tb


def kernel(lt_ref, tb_ref, out_ref):
    i32 = jnp.int32
    f32 = jnp.float32
    lane_r = lax.broadcasted_iota(i32, (pm.H_PAD, RL), 1) % i32(128)
    # selector matmul operand skeleton: D[s, l] = l - j(s); e_g = (D == 8g)
    sub = lax.broadcasted_iota(i32, (RL, 128), 0)
    lane = lax.broadcasted_iota(i32, (RL, 128), 1)
    d = lane - sub // i32(128)
    lt_bf16 = lt_ref[:].astype(jnp.bfloat16)
    tb_bf16 = tb_ref[:].astype(jnp.bfloat16)
    S = jnp.zeros((pm.H_PAD, 128), f32)
    for g in range(NG):
        sl = lt_bf16[8 * g:8 * g + KP, :]       # 8-aligned static slice
        rx = lax.dot_general(
            sl, tb_bf16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)          # [H_PAD, RL]
        for b in range(7):
            shift = 1 << b
            rolled = pltpu.roll(rx, i32(pm.H_PAD - shift), 0)
            rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        e = (d == i32(8 * g)).astype(f32)        # [RL, 128]
        S = S + lax.dot_general(
            rx, e, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)
    out_ref[...] = S[:OH_PAD, :]


def run():
    lt = jnp.swapaxes(jnp.asarray(L), 1, 2)
    lt_pad = jnp.zeros((B, pm.W_PAD, pm.H_PAD), jnp.float32)
    lt_pad = lt_pad.at[:, :250, :250].set(lt).reshape(B * pm.W_PAD, pm.H_PAD)
    tb = jnp.asarray(make_tbig(T))

    @jax.jit
    def f(lt_pad, tb):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * OH_PAD, 128), jnp.float32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((pm.W_PAD, pm.H_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KP, RL), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((OH_PAD, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(lt_pad, tb)
        return out

    out = f(lt_pad, tb)
    _ = float(out.sum())
    ts = []
    for _ in range(5):
        t0 = time.time()
        o = f(lt_pad, tb)
        _ = float(o.sum())
        ts.append(time.time() - t0)
    print(f"grouped8 best {min(ts)*1e3:7.2f} ms")

    ref = pm.match_scores_pallas(
        jnp.asarray(L), jnp.asarray(T), jnp.float32(0.0))
    got = out.reshape(B, OH_PAD, 128)[:, :OH, :OW]
    diff = jnp.max(jnp.abs(ref - got))
    print("max |diff| vs shipping kernel:", float(diff))


with jax.enable_x64(False):
    run()
