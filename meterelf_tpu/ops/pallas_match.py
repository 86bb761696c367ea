"""Pallas TPU kernel for the TM_CCOEFF correlation search.

The XLA formulations (2D conv, im2col einsum, row-wise 1D conv) all
materialize a [B, H, th+1, ow] intermediate in HBM (~4 GB at B=512) and
pay for it in bandwidth. This kernel keeps everything per-image in VMEM:

  scores[y, x] = sum_r sum_c T[r, c] * L[y+r, x+c]

- grid over images; per image the transposed lightness LT[w, h] sits in
  VMEM (256 KB).
- for each output column x: one MXU matmul
    Rx[iy, r] = sum_c LT[x+c, iy] * T[r, c]
  using a 192-wide sublane slice of LT (template columns 188..191 are
  zero-padded, so the overhang multiplies by zero).
- the diagonal reduction sum_r Rx[y+r, r] uses a log-shift trick: roll
  lane-column r up by r sublanes in 7 masked power-of-two steps, then a
  lane-sum yields all 132 outputs of column x at once.

The mean-term (boxsum) half of TM_CCOEFF is computed outside in XLA via
an exact integral image (partial sums stay below 2^24, exact in f32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_PAD = 256   # lightness height padded (250 -> 256 lanes)
W_PAD = 256   # lightness width padded (250 -> 256 sublanes)
R_PAD = 128   # template rows padded (119 -> 128 lanes)
K_PAD = 192   # template cols padded (188 -> 192, zero-filled)


def _corr_kernel(lt_ref, t_ref, out_ref, *, ow: int, oh: int, th: int):
    """One image per grid program; the 63 output columns are a statically
    unrolled loop (static slices and rolls — no dynamic lane indexing,
    no per-column program-launch overhead).

    lt_ref: [W_PAD, H_PAD] f32 (transposed, zero-padded lightness)
    t_ref:  [R_PAD, K_PAD] f32 (template rows, zero-padded)
    out_ref: [oh, ow] f32 scores."""
    i32 = jnp.int32
    lane_r = lax.broadcasted_iota(jnp.int32, (H_PAD, R_PAD), 1)
    valid = lane_r < i32(th)

    # operands are integers <= 255: exactly representable in bf16 (8-bit
    # significand), and the MXU accumulates in f32, so the bf16 matmul is
    # bit-identical to the f32 one at ~4x the MXU rate. The per-column
    # contraction spans 188 products <= 255*255, so partial sums stay
    # below 2^24 and rx itself is exact.
    t_bf16 = t_ref[:].astype(jnp.bfloat16)
    lt_bf16 = lt_ref[:].astype(jnp.bfloat16)
    cols = []
    for x in range(ow):
        sl = lt_bf16[x:x + K_PAD, :]          # static sublane slice
        # Rx[iy, r] = sum_k sl[k, iy] * t[r, k]
        rx = lax.dot_general(
            sl, t_bf16,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # [H_PAD, R_PAD]
        # roll lane-column r up by r sublanes (static log-shift steps)
        for b in range(7):
            shift = 1 << b
            rolled = pltpu.roll(rx, i32(H_PAD - shift), 0)
            rx = jnp.where((lane_r & i32(shift)) != i32(0), rolled, rx)
        # rx[y, r] = Rx[y+r, r] (mod H_PAD); sum valid template rows
        col = jnp.sum(jnp.where(valid, rx, jnp.float32(0.0)),
                      axis=1, keepdims=True)   # [H_PAD, 1]
        cols.append(col[:oh, :])
    out_ref[...] = jnp.concatenate(cols, axis=1)


def _corr_pallas(lt_pad, t_pad, *, interpret=False):
    # the whole kernel (and its index maps) must trace in 32-bit mode:
    # under jax_enable_x64 even index-map literals become i64, which
    # Mosaic cannot lower
    with jax.enable_x64(False):
        return _corr_pallas_32(lt_pad, t_pad, interpret=interpret)


def _corr_pallas_32(lt_pad, t_pad, *, interpret=False):
    oh_pad = 136  # 132 rounded up to a multiple of 8 (sublane tiling)
    ow = 63
    th = 119
    B = lt_pad.shape[0] // W_PAD
    kern = functools.partial(_corr_kernel, ow=ow, oh=oh_pad, th=th)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * oh_pad, ow), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((W_PAD, H_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_PAD, K_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((oh_pad, ow), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lt_pad, t_pad)
    return out.reshape(B, oh_pad, ow)


def match_scores_pallas(
    lightness_f32: jnp.ndarray,   # [B, H, W] f32
    template_u8: jnp.ndarray,     # [th, tw]
    template_mean: float,         # f32 scalar
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W = lightness_f32.shape
    th, tw = template_u8.shape
    oh, ow = H - th + 1, W - tw + 1
    assert (H, W, th, tw) == (250, 250, 119, 188), (
        "pallas matcher is specialized to the meterelf shape family")

    lt = jnp.swapaxes(lightness_f32, 1, 2)               # [B, W, H]
    lt_pad = jnp.zeros((B, W_PAD, H_PAD), jnp.float32)
    lt_pad = lt_pad.at[:, :W, :H].set(lt).reshape(B * W_PAD, H_PAD)
    t_pad = jnp.zeros((R_PAD, K_PAD), jnp.float32)
    t_pad = t_pad.at[:th, :tw].set(template_u8.astype(jnp.float32))

    corr = _corr_pallas(lt_pad, t_pad, interpret=interpret)[:, :oh, :ow]

    # exact boxsum via integral image: L values are integers <= 255 and
    # the full-image sum < 2^24, so f32 cumsums are exact
    cs = jnp.cumsum(jnp.cumsum(lightness_f32, axis=1), axis=2)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (1, 0)))
    box = (cs[:, th:, tw:] - cs[:, :-th, tw:]
           - cs[:, th:, :-tw] + cs[:, :-th, :-tw])        # [B, oh, ow]
    return corr - jnp.float32(template_mean) * box


def kernel_squares_hint() -> str:
    """Cost estimate hook (placeholder for compiler hints)."""
    return pl.CostEstimate(
        flops=2 * 63 * 192 * 128 * 256,
        bytes_accessed=W_PAD * H_PAD * 4,
        transcendentals=0,
    )
