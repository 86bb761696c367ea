"""Exact reimplementation of OpenCV 3.4.x cvtColor(BGR2HLS_FULL) for uint8.

Old OpenCV computed 8u HLS via the float path: u8 * (1/255) -> RGB2HLS_f
(float32 arithmetic) -> scale (H by 256/360 for FULL, L/S by 255) ->
saturate_cast<uchar> (round-half-to-even, clamp). This module mirrors that
bit-for-bit using numpy float32.

Reference behavior being replaced: meterelf/_utils.py:100-102 (cv2 call).
"""
import numpy as np


def bgr_to_hls_full_u8(bgr: np.ndarray) -> np.ndarray:
    """bgr: (...,3) uint8 -> hls (...,3) uint8, FULL hue range (0..255)."""
    assert bgr.dtype == np.uint8
    scale = np.float32(1.0) / np.float32(255.0)
    b = bgr[..., 0].astype(np.float32) * scale
    g = bgr[..., 1].astype(np.float32) * scale
    r = bgr[..., 2].astype(np.float32) * scale

    vmax = np.maximum(np.maximum(r, g), b)
    vmin = np.minimum(np.minimum(r, g), b)
    l = (vmax + vmin) * np.float32(0.5)

    diff = vmax - vmin
    nonzero = vmax != vmin
    # s
    denom_lo = vmax + vmin
    denom_hi = np.float32(2.0) - vmax - vmin
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(
            l < np.float32(0.5),
            diff / denom_lo,
            diff / denom_hi,
        ).astype(np.float32)
        # h
        diff60 = (np.float32(60.0) / diff).astype(np.float32)
        h_r = (g - b) * diff60
        h_g = (b - r) * diff60 + np.float32(120.0)
        h_b = (r - g) * diff60 + np.float32(240.0)
    h = np.where(vmax == r, h_r, np.where(vmax == g, h_g, h_b)).astype(np.float32)
    h = np.where(h < 0, h + np.float32(360.0), h).astype(np.float32)
    h = np.where(nonzero, h, np.float32(0.0))
    s = np.where(nonzero, s, np.float32(0.0)).astype(np.float32)

    hscale = np.float32(256.0) / np.float32(360.0)  # FULL range
    h_out = _saturate_u8(h * hscale)
    l_out = _saturate_u8(l * np.float32(255.0))
    s_out = _saturate_u8(s * np.float32(255.0))
    return np.stack([h_out, l_out, s_out], axis=-1)


def _saturate_u8(x: np.ndarray) -> np.ndarray:
    """cv::saturate_cast<uchar>(float): round half-to-even, clamp 0..255."""
    r = np.rint(x)  # rint = round half to even
    return np.clip(r, 0, 255).astype(np.uint8)


if __name__ == "__main__":
    import cv2

    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, size=(512, 512, 3), dtype=np.uint8)
    ours = bgr_to_hls_full_u8(bgr)
    cvs = cv2.cvtColor(bgr, cv2.COLOR_BGR2HLS_FULL)
    diff = ours.astype(int) - cvs.astype(int)
    for c, name in enumerate("HLS"):
        d = diff[..., c]
        print(f"{name}: exact={(d == 0).mean() * 100:.4f}%  maxabs={np.abs(d).max()}")
