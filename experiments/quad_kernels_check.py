"""TPU validation: fused windows+quad-CCL kernels vs the XLA window
stage and pair-CCL — bit-equality of masks, owner keys, and convergence
on real corpus superwindows AND random noise. (CPU backends cannot
byte-compare differently-structured f32 HLS graphs: the CPU emitter
fuses with excess precision per structure; TPU is strict per-op.)"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
import tempfile
from glob import glob
from meterelf_tpu import synthetic
from meterelf_tpu.params import DIAL_WIN, Params
from meterelf_tpu.pipeline import decode as dec
from meterelf_tpu.ops import pallas_windows as pw
from meterelf_tpu.ops import pallas_ccl as pc
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.ops.pallas_frontend import frontend_pallas, H_PAD, W_PAD

W = DIAL_WIN
D = 4

def check(params, sw_np, tag):
    pa = params.arrays()
    origins = [(int(x), int(y)) for x, y in np.asarray(pa.win_origin)]
    centers = [(int(x), int(y)) for x, y in np.asarray(pa.centers_int)]
    B = sw_np.shape[0]
    swj = jax.device_put(sw_np)

    @jax.jit
    def xla_masks(swj):
        ms, cs = [], []
        for i in range(D):
            ox, oy = origins[i]
            win_pk = swj[:, oy:oy + W, ox:ox + W]
            m, c = jax.vmap(lambda wp, i=i: dec._dial_masks_from_packed_window(
                wp, pa.color_range[i], centers[i], pa.mask_full[i],
                pa.hue_shift))(win_pk)
            ms.append(m); cs.append(c)
        return jnp.stack(ms, 1), jnp.stack(cs, 1)

    m_x, c_x = map(np.asarray, xla_masks(swj))

    disk_quad = jnp.asarray(np.concatenate(
        [np.asarray(pa.mask_full[i]).astype(np.int32) for i in range(D)],
        axis=1))
    bits = jax.jit(lambda s: pw.window_bits_quads(
        s, disk_quad, jnp.asarray(pa.color_range), pa.hue_shift,
        tuple(origins), tuple(centers)))(swj)
    bn = np.asarray(bits)
    m_q = ((bn & 1) != 0).reshape(B, W, D, W).transpose(0, 2, 1, 3)
    c_q = (((bn >> 2) & 1) != 0).reshape(B, W, D, W).transpose(0, 2, 1, 3)
    print(tag, "masked equal:", np.array_equal(m_x, m_q),
          " closed equal:", np.array_equal(c_x, c_q),
          f"({(m_x != m_q).sum()} / {(c_x != c_q).sum()} diffs)")

    # quad CCL vs pair CCL on the kernel's masks
    mk = m_q.reshape(B * D, W, W)
    dk = np.broadcast_to(np.asarray(pa.mask_full)[None],
                         (B, D, W, W)).reshape(B * D, W, W).copy()
    okey_p, conv_p = jax.jit(pc.propagate)(jnp.asarray(mk), jnp.asarray(dk))
    okey_q, conv_q = jax.jit(pc.propagate_quads)(bits)
    oq = np.asarray(okey_q).reshape(B, W, D, W).transpose(0, 2, 1, 3).reshape(B * D, W, W)
    print(tag, "okey equal:", np.array_equal(np.asarray(okey_p), oq),
          " conv equal:",
          np.array_equal(np.asarray(conv_p).reshape(B, D), np.asarray(conv_q)))

    # fused-stats chain (pack_closed okey3 -> in-kernel contrib ->
    # keymax/has_any -> gather-point region) vs analyze_batch
    import functools
    from meterelf_tpu.ops import components as comp_ops
    from meterelf_tpu.ops import pallas_stats as ps
    ck = c_q.reshape(B * D, W, W)
    okey3_q, conv3_q = jax.jit(functools.partial(
        pc.propagate_quads, pack_closed=True))(bits)
    o3 = (np.asarray(okey3_q).reshape(B, W, D, W)
          .transpose(0, 2, 1, 3).reshape(B * D, W, W))
    km, hasany = map(np.asarray, jax.jit(ps.stats_select_fused)(
        jnp.asarray(o3)))
    owner = o3 >> 3
    closed_bit = (o3 >> 2) & 1
    big = (km >= 0) & ((km >> 12) > 200)
    sel = np.where(km >= 0, km & 4095, W * W)
    region = np.where(big[:, None, None],
                      owner == sel[:, None, None], closed_bit != 0)
    ref = jax.jit(comp_ops.analyze_batch, static_argnames=("impl",))(
        jnp.asarray(mk), jnp.asarray(ck), jnp.asarray(dk), impl="xla")
    print(tag, "fused region equal:",
          np.array_equal(region, np.asarray(ref.needle_region)),
          " fused hasany equal:",
          np.array_equal(hasany, np.asarray(ref.has_any)),
          " fused conv equal:",
          np.array_equal(np.asarray(conv3_q), np.asarray(conv_q)))

# real corpus superwindows via the frontend kernel
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops, ok = jio.load_crops(files, params.meter_rect)
packed = jio.pack_crops(crops, pad_hw=(H_PAD, W_PAD))
tsum = int(np.asarray(pa.template_u8).astype(np.int64).sum())
tmean = np.float32(tsum / pa.template_zm.size)
mv1, mx1, my1, sw1 = jax.jit(lambda p: frontend_pallas(
    p, jnp.asarray(pa.template_u8), tmean))(jax.device_put(packed))
check(params, np.asarray(sw1), "corpus1:")

# random superwindows
rng = np.random.default_rng(0)
swr = (rng.integers(0, 256, (64, 136, 256)).astype(np.int32)
       | (rng.integers(0, 256, (64, 136, 256)).astype(np.int32) << 8)
       | (rng.integers(0, 256, (64, 136, 256)).astype(np.int32) << 16))
check(params, swr, "random :")

# merged frontend+windows kernel vs the split composition on the corpus
from meterelf_tpu.ops.pallas_frontend import frontend_windows_pallas
from meterelf_tpu.ops import pallas_windows as pw
origins = tuple((int(x), int(y)) for x, y in np.asarray(pa.win_origin))
centers = tuple((int(x), int(y)) for x, y in np.asarray(pa.centers_int))
disk_quad = jnp.asarray(np.concatenate(
    [np.asarray(pa.mask_full[i]).astype(np.int32) for i in range(D)],
    axis=1))
bits1 = jax.jit(lambda s: pw.window_bits_quads(
    s, disk_quad, jnp.asarray(pa.color_range), pa.hue_shift,
    origins, centers))(sw1)
mv2, mx2, my2, bits2 = jax.jit(lambda p: frontend_windows_pallas(
    p, jnp.asarray(pa.template_u8), tmean, disk_quad,
    jnp.asarray(pa.color_range), pa.hue_shift, origins, centers))(
        jax.device_put(packed))
print("merged : stat equal:",
      (np.array_equal(np.asarray(mv1), np.asarray(mv2))
       and np.array_equal(np.asarray(mx1), np.asarray(mx2))
       and np.array_equal(np.asarray(my1), np.asarray(my2))),
      " bits equal:",
      np.array_equal(np.asarray(bits1), np.asarray(bits2)))
