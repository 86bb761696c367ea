"""Step-by-step probe of one dial's needle extraction, with visual dumps.

Faithful NumPy re-derivation of reference _reading.py logic (independent
implementation, used to find where modern-stack behavior diverges from the
goldens).
"""
import math
import sys

import numpy as np
import cv2

sys.path.insert(0, "/root/repo")
from experiments.decode_sweep import decode  # noqa: E402
from experiments.hls_exact import bgr_to_hls_full_u8  # noqa: E402

SAMPLE = "/root/reference/sample-images1"
METER_RECT = ((50, 160), (300, 410))
HUE_SHIFT = 128

DIALS = {
    "0.0001": dict(color_range=(10, 35, 65), dist=4, thick=10, zero=-4.5,
                   center=(37.3, 63.4), diameter=16, neg=False),
    "0.001": dict(color_range=(15, 60, 80), dist=4, thick=10, zero=-4.5,
                  center=(94.0, 86.0), diameter=15, neg=True),
    "0.01": dict(color_range=(10, 45, 50), dist=4, thick=6, zero=-4.5,
                 center=(135.0, 71.9), diameter=11, neg=False),
    "0.1": dict(color_range=(15, 55, 60), dist=4, thick=9, zero=-4.5,
                center=(160.9, 36.5), diameter=12, neg=False),
}


def get_angle_by_vector(x, y):
    if y == 0:
        return 0.25 if x > 0 else 0.75 if x < 0 else None
    atan = math.atan(x / y) / (2 * math.pi)
    return (-atan + (0.5 if y > 0 else 0.0)) % 1.0


def dial_masks(spec, shape=(119, 188)):
    """Replicate _dial_data.py: circles + flood fill -> (mask, circle_mask)."""
    mask = np.zeros(shape, np.uint8)
    radius = int(round(spec["diameter"] / 2.0))
    cx, cy = int(round(spec["center"][0])), int(round(spec["center"][1]))
    r0 = radius + spec["dist"]
    for i in (0, spec["thick"] - 1):
        cv2.circle(mask, (cx, cy), r0 + i, 255)
    fill = np.zeros((shape[0] + 2, shape[1] + 2), np.uint8)
    cv2.floodFill(mask, fill, (cx + r0 + 1, cy), 255)
    circle_mask = mask.copy()
    cv2.floodFill(mask, fill, (cx, cy), 255)
    return mask, circle_mask


def probe(fn, dial_name, dct=0, fancy=1, use_exact_hls=True, out_prefix=None):
    img = decode(f"{SAMPLE}/{fn}", dct, fancy)
    (x0, y0), (x1, y1) = METER_RECT
    crop = img[y0:y1, x0:x1]
    if use_exact_hls:
        hls = bgr_to_hls_full_u8(crop)
    else:
        hls = cv2.cvtColor(crop, cv2.COLOR_BGR2HLS_FULL)
    hls = hls + np.array([HUE_SHIFT, 0, 0], np.uint8)  # wrapping add

    tmpl = cv2.imread(f"{SAMPLE}/dials_gray.png", cv2.IMREAD_GRAYSCALE)
    res = cv2.matchTemplate(hls[:, :, 1], tmpl, cv2.TM_CCOEFF)
    _, max_val, _, (mx, my) = cv2.minMaxLoc(res)
    dials_hls = hls[my:my + 119, mx:mx + 188]
    print(f"{fn} dial={dial_name}: match loc=({mx},{my}) val={max_val}")

    spec = DIALS[dial_name]
    cx, cy = spec["center"]
    ix, iy = int(cx), int(cy)
    core = dials_hls[iy - 2:iy + 3, ix - 2:ix + 3]
    mean = core.reshape(-1, 3).mean(axis=0)  # cv2.mean = exact double mean
    dial_color = np.array([int(round(v)) for v in mean], np.uint8)
    print(f"  sampled dial_color (HLS) = {dial_color.tolist()}")

    cr = spec["color_range"]
    lo = np.clip(dial_color.astype(int) - cr, 0, 255).astype(np.uint8)
    hi = np.clip(dial_color.astype(int) + cr, 0, 255).astype(np.uint8)
    raw_mask = cv2.inRange(dials_hls, lo, hi)
    print(f"  inRange [{lo.tolist()}..{hi.tolist()}]: {np.count_nonzero(raw_mask)} px")

    kernel = np.ones((3, 3), np.uint8)
    closed = cv2.erode(cv2.dilate(raw_mask, kernel), kernel)
    mask_full, circle_mask = dial_masks(spec)
    anded = closed & mask_full
    contours, _ = cv2.findContours(anded, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    print(f"  contours: {len(contours)} areas={sorted(cv2.contourArea(c) for c in contours)[-4:]}")
    contour = sorted(contours, key=cv2.contourArea)[-1]
    if cv2.contourArea(contour) > 100:
        needle_mask = np.zeros_like(closed)
        cv2.drawContours(needle_mask, [contour], -1, 255, -1)
        print("  (largest contour kept)")
    else:
        needle_mask = closed

    pts = cv2.findNonZero(needle_mask & mask_full)
    pts = [p[0] for p in pts] if pts is not None else []
    momentum_x = momentum_y = 0.0
    for p in pts:
        dx, dy = p[0] - cx, p[1] - cy
        momentum_x += (-1 if dx < 0 else 1) * dx ** 2
        momentum_y += (-1 if dy < 0 else 1) * dy ** 2
    sign = -1 if spec["neg"] else 1
    mom_angle = get_angle_by_vector(sign * momentum_x, sign * momentum_y)
    print(f"  needle px={len(pts)} momentum=({momentum_x:.1f},{momentum_y:.1f}) "
          f"sign={sign} mom_angle={mom_angle}")

    outer = cv2.findNonZero(needle_mask & circle_mask)
    outer = [p[0] for p in outer] if outer is not None else []
    kept = []
    for p in outer:
        dx, dy = p[0] - cx, p[1] - cy
        ang = get_angle_by_vector(dx, dy)
        if ang is None or mom_angle is None:
            continue
        d = min(abs(ang - mom_angle), abs(abs(ang - mom_angle) - 1))
        if d < 0.25:
            kept.append((ang, dx * dx + dy * dy))
    print(f"  outer px={len(outer)} kept(tip)={len(kept)}")
    if not kept:
        print("  -> UNREADABLE")
        return None
    mn = min(a for a, _ in kept)
    rot = [((a, d) if abs(a - mn) < 0.75 else (a - 1, d)) for a, d in kept]
    if len(rot) >= 5:
        cut = min(2, (len(rot) - 3) // 2)
        rot = sorted(rot)[cut:-cut]
    angle = sum(a * d for a, d in rot) / sum(d for _, d in rot)
    pos = (10.0 * (angle - spec["zero"] / 360.0)) % 10.0
    print(f"  angle={angle:.5f} position={pos:.4f}")

    if out_prefix:
        over = cv2.cvtColor(dials_hls[:, :, 1], cv2.COLOR_GRAY2BGR)
        over[raw_mask > 0] = (0, 128, 255)
        over[(needle_mask & mask_full) > 0] = (0, 0, 255)
        over[(needle_mask & circle_mask) > 0] = (255, 0, 255)
        over = cv2.resize(over, (188 * 4, 119 * 4), interpolation=cv2.INTER_NEAREST)
        cv2.circle(over, (int(cx * 4), int(cy * 4)), 3, (255, 255, 0), -1)
        cv2.imwrite(f"/tmp/{out_prefix}_{dial_name}.png", over)
    return pos


if __name__ == "__main__":
    fn = "20180814021357-00-e01.jpg"
    for dial in DIALS:
        probe(fn, dial, out_prefix="probe")
    print("\nexpected from golden 905.126: 0.1≈9.x 0.01≈0.x 0.001≈5.x 0.0001=1.26")
