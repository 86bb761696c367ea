"""TPU validation of the sharding x Pallas composition (VERDICT weak #9):
compile the production conv_precision="pallas" decode graph (int8-MXU
frontend + quad window/CCL kernels) under a sharded jit on a 1-device
TPU mesh and require bit-equality with the unsharded single-chip graph
on real corpus crops. Prints SHARDED_PALLAS_OK on success, NO_TPU when
no TPU is visible (caller should treat that as a skip)."""
import sys

sys.path.insert(0, "/root/repo")
from glob import glob

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

tpus = [d for d in jax.devices() if d.platform == "tpu"]
if not tpus:
    print("NO_TPU")
    raise SystemExit(0)

from meterelf_tpu.io import jpeg as jio               # noqa: E402
from meterelf_tpu.params import Params                # noqa: E402
from meterelf_tpu.parallel.mesh import (              # noqa: E402
    data_parallel_decoder, make_mesh)
from meterelf_tpu.pipeline.decode import MeterDecoder  # noqa: E402

params = Params.load("/root/reference/sample-images1/params.yml")
files = sorted(glob("/root/reference/sample-images1/2018*.jpg"))[:8]
crops, ok = jio.load_crops(files, params.meter_rect, 8)
packed = jio.pack_crops(crops, pad_hw=jio.frontend_pad_hw())

dec = MeterDecoder(params)  # default precision on TPU = pallas
res1 = jax.tree.map(np.asarray, dec(packed, ok))

mesh = make_mesh(tpus[:1])
sharded = data_parallel_decoder(dec, mesh)  # platform tpu -> "pallas"
res2 = jax.tree.map(np.asarray, sharded(packed, ok))

for f in ("err", "value", "dial_pos", "match_val", "converged"):
    a, b = getattr(res1, f), getattr(res2, f)
    assert np.array_equal(a, b), (f, a, b)
print("SHARDED_PALLAS_OK", res1.err.tolist())
