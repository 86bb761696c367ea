"""Run the REFERENCE pipeline with our native JPEG decoder injected, to
isolate which decode settings reproduce the golden outputs.

The reference code is used strictly as a numerical oracle (executed, not
copied). Shims: cv2-3 findContours arity, pyyaml Loader, cv2.imread -> our
decoder for .jpg files.
"""
import io
import sys
import contextlib
from glob import glob

import cv2
import numpy as np
import yaml

sys.path.insert(0, "/root/repo")
from experiments.decode_sweep import decode  # noqa: E402

# ---- shims so the 2019 reference runs on the 2026 stack ----
_real_yaml_load = yaml.load
yaml.load = lambda stream, Loader=None: _real_yaml_load(stream, Loader=yaml.SafeLoader)

_real_find_contours = cv2.findContours
def _find_contours3(*a, **k):
    contours, hier = _real_find_contours(*a, **k)
    return (None, contours, hier)
cv2.findContours = _find_contours3

_real_find_non_zero = cv2.findNonZero
def _find_non_zero_legacy(img):
    r = _real_find_non_zero(img)
    if r is None or r.ndim == 3:
        return r
    return r.reshape(-1, 1, 2)  # cv2 3.x shape (N,1,2)
cv2.findNonZero = _find_non_zero_legacy

_real_imread = cv2.imread
DECODE_SETTINGS = {"dct": 0, "fancy": 1}
def _imread(path, flags=cv2.IMREAD_COLOR):
    if path.lower().endswith((".jpg", ".jpeg")) and flags == cv2.IMREAD_COLOR:
        return decode(path, DECODE_SETTINGS["dct"], DECODE_SETTINGS["fancy"])
    return _real_imread(path, flags)
cv2.imread = _imread

sys.path.insert(0, "/root/reference")
from meterelf import _main  # noqa: E402


def run_sample_dir(sample_dir):
    import os
    old = os.getcwd()
    os.chdir(sample_dir)
    try:
        files = sorted(glob("*.jpg"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _main.main(["meterelf", "params.yml"] + files)
        return buf.getvalue()
    finally:
        os.chdir(old)


def score(output, golden_path):
    with open(golden_path) as fp:
        golden = fp.read().splitlines()
    got = output.splitlines()
    matches = sum(1 for a, b in zip(got, golden) if a == b)
    mismatches = [(a, b) for a, b in zip(got, golden) if a != b]
    return matches, len(golden), mismatches


if __name__ == "__main__":
    golden1 = "/root/reference/integration-tests/test_all_sample_images.expected_stdout"
    golden2 = "/root/reference/tests/sample-images2_stdout.txt"
    results = {}
    for dct, name in [(0, "ISLOW"), (1, "IFAST"), (2, "FLOAT")]:
        for fancy in (0, 1):
            DECODE_SETTINGS["dct"] = dct
            DECODE_SETTINGS["fancy"] = fancy
            out1 = run_sample_dir("/root/reference/sample-images1")
            m1, n1, mm1 = score(out1, golden1)
            out2 = run_sample_dir("/root/reference/sample-images2")
            m2, n2, mm2 = score(out2, golden2)
            key = f"dct={name} fancy={fancy}"
            results[key] = (m1, n1, m2, n2, mm1[:4])
            print(f"{key}: sample1 {m1}/{n1}  sample2 {m2}/{n2}")
    best = max(results.items(), key=lambda kv: kv[1][0] + kv[1][2])
    print("\nBest:", best[0])
    for got, exp in best[1][4]:
        print(f"  got: {got}\n  exp: {exp}")
