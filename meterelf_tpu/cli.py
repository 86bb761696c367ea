"""CLI entry point (reference: meterelf/_main.py).

Output format is byte-identical to the reference, including its quirk of
printing an empty value when the reading is exactly 0.000 (`if data.value`
treats 0.0 as falsy, _main.py:17).

DEBUG mode (any token in the ``DEBUG`` env var) appends the per-dial
reading dict to each line and writes annotated overlay PNGs — the
headless analog of the reference's cv2.imshow windows
(meterelf/_reading.py:43-78) — into ``METERELF_DEBUG_DIR`` (default
``meterelf-debug``); the ``masks`` mode additionally writes the
precomputed per-dial masks (meterelf/_dial_data.py:50-54 analog).
"""
from __future__ import annotations

import os
import sys
from typing import Sequence

from . import debugging
from .api import get_meter_values


def main(argv: Sequence[str] = None) -> None:
    if argv is None:
        argv = sys.argv
    if len(argv) < 2:
        raise SystemExit(
            "Usage: {} PARAMETERS_FILE [IMAGE_FILE...]".format(
                argv[0] if argv else "meterelf"
            )
        )
    params_file = argv[1]
    filenames = argv[2:]
    batch_size = int(os.environ.get("METERELF_BATCH_SIZE", "64"))
    # METERELF_EXACT=0 selects the f32 fast mode (golden-identical
    # output on the shipped corpora; see docs/parity.md)
    exact = os.environ.get("METERELF_EXACT", "1") != "0"

    debug_dir = os.environ.get("METERELF_DEBUG_DIR", "meterelf-debug")
    debug_params = None
    if debugging.DEBUG:
        from . import debugviz
        from .params import load as load_params

        debug_params = load_params(params_file)
        if "masks" in debugging.DEBUG:
            debugviz.render_masks(debug_params, debug_dir)

    for data in get_meter_values(params_file, filenames,
                                 batch_size=batch_size, exact=exact):
        print(data.filename, end="")
        value_str = "{:07.3f}".format(data.value) if data.value else ""
        error_str = (
            "UNKNOWN {}".format(data.error.get_message()) if data.error
            else "")
        extra = " {!r}".format(data.meter_values) if debugging.DEBUG else ""
        print(f": {value_str}{error_str}{extra}")
        if debug_params is not None and data.error is None:
            from . import debugviz

            debugviz.render_overlay(data.filename, debug_params, debug_dir)


if __name__ == "__main__":
    main()
