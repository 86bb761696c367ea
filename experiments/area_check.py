"""Validate the dense-op surrogate for cv2 contourArea/drawContours.

For every (image, dial) in both sample sets, build the masked closed
needle mask exactly as the reference does, then compare:
  - per-component cv2.contourArea  vs  Pick surrogate F - B/2 - 1
  - largest-selection and >100 decisions
  - filled mask (drawContours -1)  vs  component+enclosed-holes fill
"""
import sys
from glob import glob

import numpy as np
import cv2

sys.path.insert(0, "/root/repo")
from experiments.decode_sweep import decode  # noqa: E402
from experiments.hls_exact import bgr_to_hls_full_u8  # noqa: E402
from meterelf_tpu.params import Params  # noqa: E402


def components_8(mask):
    n, lab = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
    return n, lab


def outside_mask(fg):
    """bg pixels 4-connected to the border."""
    h, w = fg.shape
    bg = ~fg
    out = np.zeros_like(fg)
    stack = []
    for x in range(w):
        for y in (0, h - 1):
            if bg[y, x] and not out[y, x]:
                out[y, x] = True
                stack.append((x, y))
    for y in range(h):
        for x in (0, w - 1):
            if bg[y, x] and not out[y, x]:
                out[y, x] = True
                stack.append((x, y))
    while stack:
        x, y = stack.pop()
        for nx, ny in ((x-1,y),(x+1,y),(x,y-1),(x,y+1)):
            if 0 <= nx < w and 0 <= ny < h and bg[ny, nx] and not out[ny, nx]:
                out[ny, nx] = True
                stack.append((nx, ny))
    return out


def pick_stats(fg, lab, n, outside):
    """Per-label F (filled incl. holes), B (boundary px 8-adj to outside)."""
    h, w = fg.shape
    enclosed = (~fg) & (~outside)
    # assign enclosed bg to an adjacent component (8-conn BFS from fg)
    owner = np.where(fg, lab, 0)
    todo = list(zip(*np.nonzero(enclosed)))
    # simple iterative propagation
    for _ in range(64):
        changed = False
        for (y, x) in todo:
            if owner[y, x]:
                continue
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = y+dy, x+dx
                    if 0 <= ny < h and 0 <= nx < w and owner[ny, nx]:
                        owner[y, x] = owner[ny, nx]
                        changed = True
                        break
                if owner[y, x]:
                    break
        if not changed:
            break
    F = np.bincount(owner.ravel(), minlength=n)
    # boundary: fg px with an outside 8-neighbor
    pad_out = np.pad(outside, 1, constant_values=True)
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(pad_out, (3, 3))
    adj_out = win.any(axis=(2, 3))
    bmask = fg & adj_out
    B = np.bincount(lab[bmask], minlength=n)
    return F, B


def check_one(masked):
    contours, _ = cv2.findContours(
        masked.astype(np.uint8) * 255, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    areas_cv = [cv2.contourArea(c) for c in contours]
    fg = masked.astype(bool)
    n, lab = components_8(masked)
    outside = outside_mask(fg)
    F, B = pick_stats(fg, lab, n, outside)
    area_pick = F.astype(float) - B.astype(float) / 2.0 - 1.0
    # map each contour to a label via its first point
    mism = []
    for c, a_cv in zip(contours, areas_cv):
        x, y = c[0][0]
        l = lab[y, x]
        a_p = max(area_pick[l], 0.0)
        if a_cv != a_p:
            mism.append((a_cv, a_p, int(F[l]), int(B[l])))
    # decision checks
    best = sorted(contours, key=cv2.contourArea)[-1]
    a_best_cv = cv2.contourArea(best)
    labels_present = [l for l in range(1, n)]
    key = [(max(area_pick[l], 0.0), l) for l in labels_present]
    # root ordering surrogate: use min flat index per label for tie-break
    roots = {}
    flat = lab.ravel()
    for i, l in enumerate(flat):
        if l > 0 and l not in roots:
            roots[l] = i
    key = [(max(area_pick[l], 0.0), roots[l]) for l in labels_present]
    sel = labels_present[int(np.argmax([k[0] * 1e9 + k[1] for k in key]))]
    bx, by = best[0][0]
    sel_cv = lab[by, bx]
    dec_cv = a_best_cv > 100
    dec_pick = max(area_pick[sel], 0.0) > 100
    fill_ok = True
    if dec_cv and dec_pick and sel == sel_cv:
        fill_cv = np.zeros_like(masked, np.uint8)
        cv2.drawContours(fill_cv, [best], -1, 255, -1)
        enclosed = (~fg) & (~outside)
        owner = np.where(fg, lab, 0)
        # reuse pick_stats' owner? recompute quickly
        F2, _ = pick_stats(fg, lab, n, outside)  # owner recomputed internally
        # build fill: component sel + enclosed owned by sel
        # recompute owner here:
        h, w = fg.shape
        owner = np.where(fg, lab, 0)
        todo = list(zip(*np.nonzero(enclosed)))
        for _ in range(64):
            changed = False
            for (y, x) in todo:
                if owner[y, x]:
                    continue
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = y+dy, x+dx
                        if 0 <= ny < h and 0 <= nx < w and owner[ny, nx]:
                            owner[y, x] = owner[ny, nx]; changed = True; break
                    if owner[y, x]:
                        break
            if not changed:
                break
        fill_mine = (owner == sel) & (fg | enclosed)
        fill_ok = np.array_equal(fill_cv > 0, fill_mine)
    return mism, sel == sel_cv, dec_cv == dec_pick, fill_ok


def main():
    total = mism_ct = sel_bad = dec_bad = fill_bad = 0
    examples = []
    for sdir in ("sample-images1", "sample-images2"):
        params = Params.load(f"/root/reference/{sdir}/params.yml")
        (x0, y0), (x1, y1) = params.meter_rect
        tmpl = params.arrays().template_u8
        for fn in sorted(glob(f"/root/reference/{sdir}/*.jpg")):
            img = decode(fn, 0, 1)
            if img is None:
                continue
            crop = img[y0:y1, x0:x1]
            hls = bgr_to_hls_full_u8(crop) + np.array([params.hue_shift, 0, 0], np.uint8)
            res = cv2.matchTemplate(hls[:, :, 1], tmpl, cv2.TM_CCOEFF)
            _, mv, _, (mx, my) = cv2.minMaxLoc(res)
            if mv < params.dials_match_threshold:
                continue
            dials = hls[my:my + 119, mx:mx + 188]
            for name in params.dial_names:
                dc = params.dial_centers[name]
                ix, iy = int(dc.center[0]), int(dc.center[1])
                core = dials[iy-2:iy+3, ix-2:ix+3].reshape(-1, 3)
                color = np.array([int(round(v)) for v in core.mean(axis=0)])
                cr = params.dial_color_range[name]
                lo = np.clip(color - np.array(cr), 0, 255).astype(np.uint8)
                hi = np.clip(color + np.array(cr), 0, 255).astype(np.uint8)
                raw = cv2.inRange(dials, lo, hi)
                k = np.ones((3, 3), np.uint8)
                closed = cv2.erode(cv2.dilate(raw, k), k)
                full, _ = None, None
                from meterelf_tpu.params import make_dial_masks
                fullm, _c = make_dial_masks(
                    dc.center, dc.diameter,
                    params.needle_dists_from_dial_center[name],
                    params.needle_circle_mask_thickness[name], (119, 188))
                masked = ((closed & fullm) > 0)
                r = check_one(masked)
                total += 1
                if r is None:
                    continue
                mism, sel_ok, dec_ok, fill_ok = r
                if mism:
                    mism_ct += 1
                    if len(examples) < 8:
                        examples.append((fn.split('/')[-1], name, mism))
                sel_bad += not sel_ok
                dec_bad += not dec_ok
                fill_bad += not fill_ok
    print(f"dials checked: {total}")
    print(f"area mismatches: {mism_ct}, selection wrong: {sel_bad}, "
          f">100 decision wrong: {dec_bad}, fill wrong: {fill_bad}")
    for e in examples:
        print("  ", e)


if __name__ == "__main__":
    main()
