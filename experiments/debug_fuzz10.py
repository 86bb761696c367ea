"""Root-cause the oracle-fuzz frame-10 dial-0.1 divergence.

Extracts both pipelines' intermediates for the failing dial:
  - the reference's kept (angle, sqdist) list, trim, and final angle
  - our graph's needle-region bits -> kept slots -> trim -> final angle
and diffs the sets.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("METERELF_BATCH_SIZE", "8")

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import cv2
import yaml

sys.path.insert(0, "/root/repo")
from meterelf_tpu import synthetic
from meterelf_tpu.api import _host_hls

DIAL = "0.1"

# ---------------- build camera + frames (mirror of the test) -------------
d = "/tmp/oracle_cam_dbg"
os.makedirs(d, exist_ok=True)
params = synthetic.make_params(d)
yml = os.path.join(d, "params.yml")
with open(yml, "w") as fp:
    yaml.safe_dump(
        synthetic.DEFAULT_CAMERA.params_dict(
            os.path.join(d, "synthetic_template.png")), fp)


def _frames(n=20, seed=7):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        pos = [float(p) for p in rng.uniform(0, 10, 4)]
        if i % 5 == 1:
            pos = [rng.uniform(0, 10),
                   float(int(rng.uniform(0, 10)) + rng.choice([0.44, 0.56])),
                   rng.choice([1.9, 2.1, 7.9, 8.1]),
                   rng.uniform(0, 10)]
            pos = [float(p) for p in pos]
        stub = (2,) if i % 7 == 3 else ()
        off = (int(rng.integers(5, 55)), int(rng.integers(5, 55)))
        f = synthetic.render_frame(pos, offset=off, stub_dials=stub)
        if i % 4 == 2:
            m = rng.random(f.shape[:2]) < 0.001
            f[m] = (40, 40, 200)
        frames.append(f)
    return frames


frames = _frames()
frame = frames[10]

# ---------------- reference side, instrumented ---------------------------
real_yaml_load = yaml.load
yaml.load = lambda stream, Loader=None: real_yaml_load(
    stream, Loader=yaml.SafeLoader)
real_find_contours = cv2.findContours
cv2.findContours = lambda *a, **k: (None,) + real_find_contours(*a, **k)
real_find_non_zero = cv2.findNonZero


def find_non_zero_legacy(img):
    r = real_find_non_zero(img)
    if r is None or r.ndim == 3:
        return r
    return r.reshape(-1, 1, 2)


cv2.findNonZero = find_non_zero_legacy
real_cvt = cv2.cvtColor


def cvt_exact(img, code):
    if code == cv2.COLOR_BGR2HLS_FULL:
        return _host_hls(img, 0).astype(np.uint8)
    return real_cvt(img, code)


cv2.cvtColor = cvt_exact

sys.path.insert(0, "/root/reference")
from meterelf import _params as r_params
from meterelf import _image as r_image
from meterelf import _reading as r_reading
from meterelf import _utils as r_utils
from meterelf._dial_data import get_dial_data

ref_params = r_params.load(yml)
imgf = r_image.ImageFile("<fuzz>", ref_params, frame)
dials_hls = imgf.get_dials_hls()
dial_data = get_dial_data(ref_params)[DIAL]

needle_points, needle_mask = r_reading.get_needle_points(
    ref_params, dials_hls, dial_data, dials_hls)


def get_needle_de(params_, hls, dd):
    """The reference's pre-contour de-speckled mask (dilate+erode)."""
    dial_color = r_reading.get_dial_color(hls, dd)
    m = r_utils.get_mask_by_color(
        hls, dial_color, params_.dial_color_range[dd.name])
    kernel = np.ones((3, 3), np.uint8)
    return cv2.erode(cv2.dilate(m, kernel), kernel)

momentum_x = momentum_y = 0.0
for p in needle_points:
    (x, y) = p - dial_data.center
    momentum_x += (-1 if x < 0 else 1) * x ** 2
    momentum_y += (-1 if y < 0 else 1) * y ** 2
mom_sign = -1 if DIAL in ref_params.negative_momentum_dials else 1
momentum_vector = (mom_sign * momentum_x, mom_sign * momentum_y)
momentum_angle = r_utils.get_angle_by_vector(momentum_vector)
print("REF momentum:", momentum_vector, "angle:", momentum_angle)

outer_points = r_utils.find_non_zero(needle_mask & dial_data.circle_mask)
kept_ref = []
rejected_ref = []
for op in outer_points:
    (x, y) = op - dial_data.center
    angle = r_utils.get_angle_by_vector((x, y))
    if angle is not None and momentum_angle is not None:
        dist = min(abs(angle - momentum_angle),
                   abs(abs(angle - momentum_angle) - 1))
        if dist < 0.25:
            kept_ref.append((int(op[0]), int(op[1]), angle, float(x*x + y*y)))
        else:
            rejected_ref.append((int(op[0]), int(op[1]), angle, dist))
print(f"REF outer={len(outer_points)} kept={len(kept_ref)}")

aas = [(a, dd) for (_x, _y, a, dd) in kept_ref]
min_angle = min(a for a, _ in aas)
aas_r = [((a, dd) if abs(a - min_angle) < 0.75 else (a - 1, dd))
         for (a, dd) in aas]
if len(aas_r) >= 5:
    cut = min(2, (len(aas_r) - 3) // 2)
    center = sorted(aas_r)[cut:-cut]
else:
    cut = 0
    center = aas_r
ref_angle = (sum(a * dd for a, dd in center) / sum(dd for _a, dd in center))
print("REF cut:", cut, "n_center:", len(center))
print("REF final angle:", ref_angle, "pos:",
      (10.0 * (ref_angle - ref_params.needle_angles_of_zero[DIAL] / 360.0))
      % 10.0)

# ---------------- our side, instrumented ---------------------------------
from meterelf_tpu.params import Params, DIAL_WIN
from meterelf_tpu.pipeline import decode as dec_mod
from meterelf_tpu.ops import components as comp_ops
from meterelf_tpu.errors import ErrCode
import jax.numpy as jnp
from jax import lax

our_params = Params.load(yml)
pa = our_params.arrays()
di = [i for i, n in enumerate(our_params.dial_names)].__class__  # noqa
names = list(our_params.dial_names) if hasattr(our_params, "dial_names") else None
print("dial order attr:", names)

(x0, y0), (x1, y1) = synthetic.METER_RECT
crop = frame[y0:y1, x0:x1]
crops = crop[None].astype(np.uint8)

dec = dec_mod.MeterDecoder(our_params, exact=True, conv_precision="matmul")
kw = dec._static_kwargs
W = DIAL_WIN
c32 = crops.astype(np.int32)
packed_np = c32[..., 0] | (c32[..., 1] << 8) | (c32[..., 2] << 16)

from meterelf_tpu.ops import color as color_ops, template as template_ops

D = pa.mask_full.shape[0]
th, tw = pa.template_zm.shape


@jax.jit
def stages(packed):
    b_pl = (packed & 255).astype(jnp.uint8)
    g_pl = ((packed >> 8) & 255).astype(jnp.uint8)
    r_pl = ((packed >> 16) & 255).astype(jnp.uint8)
    lightness = color_ops.lightness_from_planes(b_pl, g_pl, r_pl).astype(
        jnp.float32)
    tsum = jnp.sum(jnp.asarray(pa.template_u8).astype(jnp.int32))
    tmean = tsum.astype(jnp.float32) / jnp.float32(th * tw)
    scores = template_ops.match_template_scores_matmul(
        lightness, jnp.asarray(pa.template_u8), tmean)
    max_val, mx, my = template_ops.locate(scores)
    masked_l, closed_l = [], []
    for i in range(D):
        win = lax.dynamic_slice(
            packed[0],
            (my[0] + pa.win_origin[i][1], mx[0] + pa.win_origin[i][0]),
            (W, W))
        m, c = dec_mod._dial_masks_from_packed_window(
            win, jnp.asarray(pa.color_range[i]),
            jnp.asarray(pa.centers_int[i]),
            jnp.asarray(pa.mask_full[i]), pa.hue_shift)
        masked_l.append(m)
        closed_l.append(c)
    masked = jnp.stack(masked_l)
    closed = jnp.stack(closed_l)
    disk_b = jnp.broadcast_to(jnp.asarray(pa.mask_full), (D, W, W))
    comp = comp_ops.analyze_batch(
        masked, closed, disk_b, impl="xla", static_bbox=kw["static_bbox"])
    return (max_val, mx, my, comp.needle_region.reshape(D, W * W),
            masked, closed)


max_val, mx, my, needle, masked_np, closed_np = jax.tree.map(
    np.asarray, stages(packed_np))
print("OUR match:", max_val, mx, my)

# which dial index is DIAL?
dial_idx = None
for i, nm in enumerate(our_params.dial_order
                       if hasattr(our_params, "dial_order") else []):
    if nm == DIAL:
        dial_idx = i
print("dial_idx:", dial_idx)
if dial_idx is None:
    # fall back: order in params file
    dial_idx = [k for k in ref_params.dial_centers].index(DIAL)
    print("fallback dial_idx:", dial_idx)

nr = needle[dial_idx]
idx = np.asarray(pa.ann_idx[dial_idx])
valid = np.asarray(pa.ann_valid[dial_idx])
annx = np.asarray(pa.ann_x[dial_idx])
anny = np.asarray(pa.ann_y[dial_idx])
anga = np.asarray(pa.ann_angle[dial_idx])
sqd = np.asarray(pa.ann_sqd[dial_idx])

dsk_idx = np.asarray(pa.disk_idx[dial_idx])
dsk_valid = np.asarray(pa.disk_valid[dial_idx])
sx2 = np.asarray(pa.disk_sx2[dial_idx])
sy2 = np.asarray(pa.disk_sy2[dial_idx])
nsign = int(np.asarray(pa.neg_sign[dial_idx]))

nb = nr[dsk_idx] & dsk_valid
mx_ = float(np.sum(np.where(nb, sx2, 0.0)))
my_ = float(np.sum(np.where(nb, sy2, 0.0)))
print("OUR momentum:", (nsign * mx_, nsign * my_))

tip = nr[idx] & valid
dot = annx * (nsign * mx_) + anny * (nsign * my_)
kept_our = tip & (dot > 0)
print("OUR n_tip:", int(tip.sum()), "kept:", int(kept_our.sum()))

# compare kept sets: map our slots to window coords
# window coord of slot = (idx % W, idx // W); convert to dial-hls coords:
# our window origin + match offset == reference coordinates?
# Reference outer_points are in dials_hls coords. Our window origin is
# win_origin[dial] + match (mx, my).
ox = int(np.asarray(pa.win_origin[dial_idx][0]))
oy = int(np.asarray(pa.win_origin[dial_idx][1]))
our_pts = {}
for s in np.nonzero(kept_our)[0]:
    fx = int(idx[s]) % W + ox
    fy = int(idx[s]) // W + oy
    our_pts[(fx, fy)] = (float(anga[s]), float(sqd[s]))
ref_pts = {(x, y): (a, dd) for (x, y, a, dd) in kept_ref}
print("only in REF:", sorted(set(ref_pts) - set(our_pts)))
print("only in OURS:", sorted(set(our_pts) - set(ref_pts)))
for k in sorted(set(ref_pts) & set(our_pts)):
    if abs(ref_pts[k][0] - our_pts[k][0]) > 0:
        print("angle mismatch at", k, ref_pts[k], our_pts[k])

# diff the filled needle mask (reference) vs our CCL needle region, 2D
def crop_win(img):
    h, w = img.shape[:2]
    pad = np.zeros((W, W), dtype=img.dtype)
    ys = slice(max(oy, 0), min(oy + W, h))
    xs = slice(max(ox, 0), min(ox + W, w))
    pad[ys.start - oy:ys.stop - oy, xs.start - ox:xs.stop - ox] = \
        img[ys, xs]
    return pad


our_region2d = nr.reshape(W, W)
ref_fill = crop_win((needle_mask > 0).astype(np.uint8)).astype(bool)
dif = np.argwhere(ref_fill != our_region2d)
print(f"filled-region 2D diffs: {len(dif)}")
for y, x in dif[:30]:
    print("  at dials_hls", (x + ox, y + oy), "ref:", ref_fill[y, x],
          "ours:", our_region2d[y, x])

# diff the pre-CCL de-speckled mask
ref_de = crop_win(
    (get_needle_de(ref_params, dials_hls, dial_data) > 0).astype(np.uint8)
).astype(bool)
our_closed = closed_np[dial_idx]
dif2 = np.argwhere(ref_de != our_closed)
print(f"pre-CCL closed-mask diffs: {len(dif2)} -> {dif2[:10].tolist()}")
