"""Binary 3x3 morphology with OpenCV border semantics.

Replaces cv2.dilate/cv2.erode at reference meterelf/_reading.py:128-130.
Verified empirically: cv2.dilate pads with 0 (-inf) and cv2.erode pads
with 255 (+inf) at image borders for 8u masks.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dilate3(mask: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] bool -> 3x3 dilation (border = False)."""
    return lax.reduce_window(
        mask, False, lax.bitwise_or,
        window_dimensions=(1,) * (mask.ndim - 2) + (3, 3),
        window_strides=(1,) * mask.ndim,
        padding=[(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)],
    )


def erode3(mask: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] bool -> 3x3 erosion (border = True)."""
    return lax.reduce_window(
        mask, True, lax.bitwise_and,
        window_dimensions=(1,) * (mask.ndim - 2) + (3, 3),
        window_strides=(1,) * mask.ndim,
        padding=[(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)],
    )


def close3(mask: jnp.ndarray) -> jnp.ndarray:
    """Morphological close: dilate then erode (reference order)."""
    return erode3(dilate3(mask))
