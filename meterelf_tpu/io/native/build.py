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
    """Compile the decoder if missing/stale; return the .so path."""
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    cmd = [
        "gcc", "-O2", "-fPIC", "-shared", "-pthread",
        SRC, "-o", LIB, "-ljpeg",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(ensure_built())
