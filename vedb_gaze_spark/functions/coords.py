"""Coordinate-convention converters (reference externals/methods.py:55).

``normalize`` / ``denormalize`` are the Pupil coordinate bridges between
pixel space and the [0,1]² norm_pos convention every gaze artifact uses,
including the y-flip variant (Pupil's norm space is y-up while image
rows are y-down). Re-expressed as COLUMN expressions so a whole frame
table converts inside whole-stage codegen — plus scalar twins for
driver-side geometry, both pinned against the reference formulas
(including the operation-order subtlety: normalize flips AFTER the
divide, denormalize flips BEFORE the multiply — so the round-trip
composes to identity up to float precision).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_cols(
    x: Column, y: Column, width: float, height: float, flip_y: bool = False
) -> tuple[Column, Column]:
    """Pixel → norm_pos columns (methods.py:55 ``normalize``)."""
    nx = x / float(width)
    ny = y / float(height)
    if flip_y:
        ny = F.lit(1.0) - ny
    return nx, ny


def denormalize_cols(
    x: Column, y: Column, width: float, height: float, flip_y: bool = False
) -> tuple[Column, Column]:
    """norm_pos → pixel columns (methods.py:69 ``denormalize``)."""
    px = x * float(width)
    ny = (F.lit(1.0) - y) if flip_y else y
    return px, ny * float(height)


def normalize(pos, size, flip_y: bool = False) -> tuple[float, float]:
    """Scalar twin of normalize_cols — the reference signature."""
    width, height = size
    x = pos[0] / float(width)
    y = pos[1] / float(height)
    if flip_y:
        return x, 1 - y
    return x, y


def denormalize(pos, size, flip_y: bool = False) -> tuple[float, float]:
    """Scalar twin of denormalize_cols — the reference signature."""
    width, height = size
    x = pos[0] * width
    y = pos[1]
    if flip_y:
        y = 1 - y
    return x, y * height
