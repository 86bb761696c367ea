"""A/B: frontend correlation x-group size (METERELF_FE_XG) — 32 (wide
groups, K=224) vs 4 (narrow groups, K=192: 192/188 column inflation).
Bit-parity asserted on (max_val, mx, my, superwindow), then
floor-amortized timing of the SPLIT frontend kernel at pipeline shape.
Round-4 VERDICT item 1 (frontend FLOP inflation)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_enable_x64", True)

from glob import glob
from meterelf_tpu.params import Params
from meterelf_tpu.io import jpeg as jio
import meterelf_tpu.ops.pallas_frontend as fe

B = 256
REPS = 16
S1 = "/root/reference/sample-images1"
params = Params.load(f"{S1}/params.yml")
pa = params.arrays()
files = sorted(glob(f"{S1}/*.jpg"))
crops_np, _ = jio.load_crops(files, params.meter_rect)
reps_t = -(-B // crops_np.shape[0])
packed = jax.device_put(jio.pack_crops(
    np.tile(crops_np, (reps_t, 1, 1, 1))[:B],
    pad_hw=(fe.STAGE, fe.STAGE)))
th, tw = pa.template_zm.shape
tmean = float(np.sum(pa.template_u8.astype(np.int64))) / (th * tw)
tmpl = jnp.asarray(pa.template_u8)

ref = None
for xg in (32, 4, 8, 16):
    fe.XG = xg   # read by geom_for at trace time

    def fr(pk, _xg=xg):
        return fe.frontend_pallas(pk, tmpl, np.float32(tmean),
                                  crop_hw=(250, 250))

    out = jax.jit(fr)(packed)
    out = [np.asarray(o) for o in out]
    if ref is None:
        ref = out
    else:
        for i, (a, b) in enumerate(zip(out, ref)):
            assert np.array_equal(a, b), (xg, i)

    @jax.jit
    def rep(pk, _xg=xg):
        def body(i):
            mv, mx, my, sw = fr(pk ^ i)
            return (mv.sum() + mx.sum().astype(jnp.float32)
                    + sw.sum().astype(jnp.float32))
        return lax.map(body, jnp.arange(REPS, dtype=jnp.int32)).sum()

    r = float(rep(packed))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = float(rep(packed))
        ts.append(time.perf_counter() - t0)
    print(f"XG={xg:2d}  {min(ts) / REPS * 1e3:7.2f} ms/256  "
          f"[{r:.4e}]", flush=True)
