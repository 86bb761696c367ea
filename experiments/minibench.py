"""Headline-only bench: the device-resident replay rate (bench.py's
`value`) for camera 1, nothing else — for quick env-knob A/Bs
(METERELF_FRONTEND, METERELF_BENCH_BATCH, METERELF_CCL_GQ, ...).
Golden-gates the corpus readings first like the real bench."""
import os
import sys
from glob import glob

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    from meterelf_tpu.params import Params
    from meterelf_tpu.pipeline.decode import MeterDecoder
    from meterelf_tpu.io import jpeg as jio
    import bench

    s1 = "/root/reference/sample-images1"
    params = Params.load(f"{s1}/params.yml")
    files = sorted(glob(f"{s1}/*.jpg"))
    dec = MeterDecoder(params, exact=True)
    crops_c, ok_c = bench.load_packed(dec, params, files, jio)
    bench.check_golden(dec, params, files, crops_c, ok_c, bench.GOLDEN1)
    v = bench.replay_rate(dec, crops_c, ok_c)
    knobs = {k: v2 for k, v2 in os.environ.items()
             if k.startswith("METERELF_")}
    print(f"value={v:.1f} img/s  knobs={knobs}", flush=True)


if __name__ == "__main__":
    main()
