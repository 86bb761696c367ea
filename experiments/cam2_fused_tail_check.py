"""On-chip byte-parity gate for the round-4 generalized fused JPEG
tail on the SECOND shipped camera: every sample-images2 frame's
coefficient window through ops/pallas_jpeg.fused_backhalf_planes
(oy=14 roll path, lw=240 lane-pad path, pad-exceeds-window zero fill)
vs the XLA block-layout tail — must be byte-identical. Camera 1 runs
as a regression control (aligned fast path)."""
import sys
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from meterelf_tpu.params import Params
from meterelf_tpu.ops import jpegdec
from meterelf_tpu.ops.pallas_jpeg import fused_backhalf_planes
from meterelf_tpu.io import jpeg as jio

for name, pdir in (("cam2", "sample-images2"), ("cam1", "sample-images1")):
    p = Params.load(f"/root/reference/{pdir}/params.yml")
    win = jpegdec.coef_window(p.meter_rect, 480, 640)
    pad_hw = jio.frontend_pad_hw()
    files = sorted(glob(f"/root/reference/{pdir}/*.jpg"))
    datas = [open(f, "rb").read() for f in files]
    cy, cb, cr, qt, ok = jio.read_coefs_batch(
        datas, win, (480, 640), plane_layout=True, num_threads=2)

    ref = np.asarray(jax.jit(
        lambda a, b, c, q: jpegdec.backhalf_to_packed(
            jpegdec._plane_to_blocks(a, win.lbh, win.lbw),
            jpegdec._plane_to_blocks(b, win.lbh // 2, win.lbw // 2),
            jpegdec._plane_to_blocks(c, win.lbh // 2, win.lbw // 2),
            q, win, pad_hw=pad_hw))(cy, cb, cr, qt))
    got = np.asarray(jax.jit(
        lambda a, b, c, q: fused_backhalf_planes(
            a, b, c, q, win, pad_hw))(cy, cb, cr, qt))
    eq = np.array_equal(got[ok], ref[ok])
    print(f"{name}: {int(ok.sum())}/{len(files)} frames, "
          f"fused==xla byte-identical: {eq}", flush=True)
    assert eq, name
print("ALL OK")
