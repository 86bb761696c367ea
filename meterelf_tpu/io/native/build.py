"""Build the native JPEG decoder shared library on demand.

Compiles meterelf_jpeg.c → _meterelf_jpeg.so next to this file (cached by
mtime). No pip deps: plain gcc + system libjpeg(-turbo).
"""
from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "meterelf_jpeg.c")
LIB = os.path.join(_HERE, "_meterelf_jpeg.so")


def ensure_built() -> str:
    """Compile the decoder if missing/stale; return the .so path.

    -O3 -march=native is worth ~7% on the Huffman hot loop (measured:
    1797 -> 1916 img/s/core on the corpus entropy decode); the library
    is always compiled on the machine that runs it, so native tuning is
    safe. Falls back to plain -O3 for compilers without -march=native.
    """
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    base = ["gcc", "-O3", "-fPIC", "-shared", "-pthread",
            SRC, "-o", LIB, "-ljpeg"]
    try:
        subprocess.run(base[:1] + ["-march=native"] + base[1:],
                       check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(ensure_built())
