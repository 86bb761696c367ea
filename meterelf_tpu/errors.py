"""Error taxonomy: exception classes for the host API plus the error-code
enum carried through the jitted graph.

Mirrors the reference hierarchy and message rendering exactly
(reference: meterelf/exceptions.py:4-52) so that CLI output lines like
``UNKNOWN Dials not found (match val = 17495704.0)`` are byte-identical.
Inside the batched graph, exceptions are impossible, so each image carries
an integer error code (plus auxiliary payload) that the host re-renders
into the corresponding exception object.
"""
from __future__ import annotations

import enum
from typing import Any, Dict, Optional


class ImageProcessingError(Exception):
    default_message: str = "Unable to process image"

    def __init__(
        self,
        filename: str = "",
        message: Optional[str] = None,
        extra_info: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.filename = filename
        self.message = message or self.default_message
        self.extra_info = extra_info
        super().__init__()

    def __str__(self) -> str:
        return self.get_message(with_filename=True, with_extra_info=True)

    def get_message(
        self,
        *,
        with_filename: bool = False,
        with_extra_info: bool = True,
    ) -> str:
        add_filename = self.filename and with_filename
        from_file = f" from file: {self.filename}" if add_filename else ""
        extra_info = self.extra_info or {}
        extra = ", ".join(f"{k} = {v}" for (k, v) in extra_info.items())
        extra_suffix = f" ({extra})" if extra and with_extra_info else ""
        return f"{self.message}{from_file}{extra_suffix}"


class ImageLoadingError(ImageProcessingError, IOError):
    default_message = "Unable to load image"


class ImageAnalyzingError(ImageProcessingError, ValueError):
    default_message = "Failed to analyze image"


class DialsNotFoundError(ImageAnalyzingError):
    default_message = "Dials not found"


class DialAngleDeterminingError(ImageAnalyzingError):
    default_message = "Cannot determine angle of a dial"


class NeedleContoursNotFoundError(ImageAnalyzingError):
    default_message = "Cannot find needle contours of a dial"


class ErrCode(enum.IntEnum):
    """Per-image status carried through the batched decode graph.

    Priority mirrors the reference's raise order (_reading.py): a template
    match below threshold short-circuits everything (DIALS_NOT_FOUND); a
    dial whose masked image is empty raises at the FIRST such dial in
    params order (NEEDLE_CONTOURS); only after all dials are processed is
    DIAL_ANGLE raised listing unreadable dials (_reading.py:98-106).
    """

    OK = 0
    LOAD = 1              # host-side decode failure (ImageLoadingError)
    DIALS_NOT_FOUND = 2   # match max_val < threshold
    NEEDLE_CONTOURS = 3   # first dial with an empty masked needle image
    DIAL_ANGLE = 4        # >=1 dial with no usable tip pixels
