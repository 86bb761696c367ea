"""Decode-parity sweep (SURVEY.md §8 / build step 0).

Find the libjpeg decode settings (dct_method x fancy_upsampling) that
reproduce the golden checksum constants pinned by the reference tests
(reference tests/test_meterelf.py:164-167):

    20180814021309-01-e01.jpg -> match val = 0.0
    20180814021310-00-e02.jpg -> match val = 17495704.0

Uses modern cv2 ONLY for ops the survey verified version-stable
(cvtColor BGR2HLS_FULL, matchTemplate).
"""
import ctypes
import sys

import numpy as np
import cv2

sys.path.insert(0, "/root/repo")
from meterelf_tpu.io.native.build import ensure_built  # noqa: E402

LIB = ctypes.CDLL(ensure_built())
LIB.mej_decode_file_opts.restype = ctypes.c_int
LIB.mej_decode_file_opts.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
    ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.c_int, ctypes.c_int, ctypes.c_int,
]

MAXW, MAXH = 1024, 1024


def decode(path, dct, fancy):
    out = np.zeros(MAXH * MAXW * 3, dtype=np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = LIB.mej_decode_file_opts(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        MAXW, MAXH, ctypes.byref(w), ctypes.byref(h), dct, fancy, 1)
    if rc != 0:
        return None
    n = h.value * w.value * 3
    return out[:n].reshape(h.value, w.value, 3).copy()


SAMPLE = "/root/reference/sample-images1"
TEMPLATE = cv2.imread(f"{SAMPLE}/dials_gray.png", cv2.IMREAD_GRAYSCALE)
assert TEMPLATE is not None and TEMPLATE.shape == (119, 188)
METER_RECT = ((50, 160), (300, 410))  # sample-images1/params.yml


def match_val(bgr):
    (x0, y0), (x1, y1) = METER_RECT
    crop = bgr[y0:y1, x0:x1]
    hls = cv2.cvtColor(crop, cv2.COLOR_BGR2HLS_FULL)
    lightness = hls[:, :, 1]
    res = cv2.matchTemplate(lightness, TEMPLATE, cv2.TM_CCOEFF)
    _, max_val, _, max_loc = cv2.minMaxLoc(res)
    return max_val, max_loc


GOLD = {
    "20180814021309-01-e01.jpg": 0.0,
    "20180814021310-00-e02.jpg": 17495704.0,
}

print("modern cv2.imread as control:")
for fn, gold in GOLD.items():
    img = cv2.imread(f"{SAMPLE}/{fn}")
    mv, loc = match_val(img) if img is not None else (None, None)
    print(f"  {fn}: {mv!r} (gold {gold!r}) loc={loc}")

names = {0: "ISLOW", 1: "IFAST", 2: "FLOAT"}
for dct in (0, 1, 2):
    for fancy in (0, 1):
        line = f"dct={names[dct]:5s} fancy={fancy}: "
        hits = 0
        for fn, gold in GOLD.items():
            img = decode(f"{SAMPLE}/{fn}", dct, fancy)
            if img is None:
                line += f"{fn}=DECODE_FAIL "
                continue
            mv, loc = match_val(img)
            ok = (mv == gold)
            hits += ok
            line += f"{fn.split('-')[0]}…={mv!r}{'✓' if ok else '✗'} "
        print(line + (" <== MATCH" if hits == 2 else ""))
