"""Shared host-side types (reference: meterelf/_types.py)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

Point = Tuple[int, int]
FloatPoint = Tuple[float, float]
Size = Tuple[int, int]  # (h, w)


class DialCenter(NamedTuple):
    center: FloatPoint
    diameter: int


class Rect(NamedTuple):
    top_left: Point
    bottom_right: Point

    @property
    def width(self) -> int:
        return self.bottom_right[0] - self.top_left[0]

    @property
    def height(self) -> int:
        return self.bottom_right[1] - self.top_left[1]


class TemplateMatchResult(NamedTuple):
    rect: Rect
    max_val: float
