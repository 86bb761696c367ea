"""Round-3 generalization check: both shipped cameras through the fused
Pallas frontend + quad path, byte-compared to the golden stdout and
cross-checked against the XLA matmul path.

Comparison contract (why not plain bitwise): integer/decision fields
(err, match_x/y, readable bits, ...) must be IDENTICAL between the two
scorer paths; float fields legitimately differ in the last ulps —
match_val by f32 summation-order noise (~350 at 1.7e7 scale, argmax and
threshold decisions unaffected; docs/performance.md), dial_pos/value by
<=1e-13 because the quad path's fused stats kernel and the XLA
analyze_batch sum f32 cell contributions in different orders. Golden
lines are rendered through the same api.result_to_data path the CLI
uses (full path in, so match-failure frames get the host cvdft
rescore; basename out, matching the recorded goldens).

Usage: python experiments/frontend_geom_check.py [camera1|camera2|both]
"""
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meterelf_tpu.api import result_to_data
from meterelf_tpu.cli import format_result
from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.params import Params
from meterelf_tpu.pipeline.decode import MeterDecoder

CORPORA = {
    "camera1": (
        "/root/reference/sample-images1",
        "/root/reference/integration-tests/"
        "test_all_sample_images.expected_stdout",
    ),
    "camera2": (
        "/root/reference/sample-images2",
        "/root/reference/tests/sample-images2_stdout.txt",
    ),
}

EXACT_FIELDS = ("err", "match_x", "match_y", "readable",
                "unreadable_bits", "first_bad_dial")


def run(name):
    sample, golden_path = CORPORA[name]
    params = Params.load(f"{sample}/params.yml")
    files = sorted(glob(f"{sample}/*.jpg"))
    golden = open(golden_path).read().splitlines()

    crops_u8, ok = jio.load_crops(files, params.meter_rect)

    ok_all = True
    results = {}
    for precision in ("pallas", "matmul"):
        dec = MeterDecoder(params, exact=True, conv_precision=precision)
        pad = (dec.feed_pad_hw
               if dec.feed_pad_hw != crops_u8.shape[1:3] else None)
        crops = jio.pack_crops(crops_u8, pad_hw=pad)
        res = dec.decode_numpy(crops, ok)
        results[precision] = res
        got = [
            format_result(
                result_to_data(f, res, i, params)
                ._replace(filename=os.path.basename(f)))
            for i, f in enumerate(files)
        ]
        bad = [(g, e) for g, e in zip(got, golden) if g != e]
        status = "OK" if (not bad and len(got) == len(golden)) else "FAIL"
        ok_all &= status == "OK"
        print(f"{name} [{precision:7s}] golden: {status} "
              f"({len(got)-len(bad)}/{len(golden)})")
        for g, e in bad[:5]:
            print(f"    got: {g}\n    exp: {e}")

    a, b = results["pallas"], results["matmul"]
    for field in EXACT_FIELDS:
        fa, fb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        if not np.array_equal(fa, fb):
            print(f"{name} cross-path MISMATCH in exact field {field}")
            ok_all = False
    for field, tol in (("dial_pos", 1e-9), ("value", 1e-9)):
        fa, fb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        fin = np.isfinite(fa) & np.isfinite(fb)
        if not np.array_equal(np.isfinite(fa), np.isfinite(fb)):
            print(f"{name} cross-path finite-mask MISMATCH in {field}")
            ok_all = False
        d = float(np.max(np.abs(fa[fin] - fb[fin]))) if fin.any() else 0.0
        flag = "OK" if d <= tol else "FAIL"
        ok_all &= d <= tol
        print(f"{name} cross-path {field}: max |diff| = {d:.3e} [{flag}]")
    return ok_all


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    names = ["camera1", "camera2"] if which == "both" else [which]
    ok = all([run(n) for n in names])
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)
