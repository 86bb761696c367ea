"""End-to-end fuzz against the REFERENCE pipeline as an executable
oracle: random synthetic frames (random needle angles, cluster offsets,
stub needles, pixel noise) are decoded by our batched graph AND by the
reference package itself (executed from /root/reference with the same
compat shims the golden-parity work validated — cv2-3 API arities,
old-cv2-exact HLS, pyyaml Loader), then compared.

This covers the space the golden corpus cannot: arbitrary needle
configurations, carry-correction boundaries, unreadable dials, and
noisy masks, with the reference's own control flow as ground truth.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

cv2 = pytest.importorskip("cv2")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "meterelf")),
    reason="reference package not mounted")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """(decode_frame, params_path): the shimmed reference pipeline over
    the default synthetic camera."""
    import yaml
    from meterelf_tpu import synthetic
    from meterelf_tpu.api import _host_hls

    d = str(tmp_path_factory.mktemp("oracle_cam"))
    params = synthetic.make_params(d)  # writes the template PNG
    yml = os.path.join(d, "params.yml")
    with open(yml, "w") as fp:
        yaml.safe_dump(
            synthetic.DEFAULT_CAMERA.params_dict(
                os.path.join(d, "synthetic_template.png")), fp)

    # ---- shims (reference runs as an oracle, never copied) ----
    real_yaml_load = yaml.load
    yaml.load = lambda stream, Loader=None: real_yaml_load(
        stream, Loader=yaml.SafeLoader)

    real_find_contours = cv2.findContours

    def find_contours3(*a, **k):
        contours, hier = real_find_contours(*a, **k)
        return (None, contours, hier)

    cv2.findContours = find_contours3

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
            # old-cv2 float-path exact conversion (the one the goldens
            # embed; modern cv2 differs by +-1 LSB on ~half of H values)
            return _host_hls(img, 0).astype(np.uint8)
        return real_cvt(img, code)

    cv2.cvtColor = cvt_exact

    sys.path.insert(0, REF)
    from meterelf import _params as r_params
    from meterelf import _image as r_image
    from meterelf import _reading as r_reading

    ref_params = r_params.load(yml)

    def decode_frame(frame_bgr):
        """-> (meter_values dict | None, error-class-name | None)"""
        imgf = r_image.ImageFile("<fuzz>", ref_params, frame_bgr)
        try:
            return r_reading.get_meter_value(imgf), None
        except Exception as exc:  # reference error taxonomy
            return None, type(exc).__name__

    try:
        yield decode_frame, params
    finally:
        yaml.load = real_yaml_load
        cv2.findContours = real_find_contours
        cv2.findNonZero = real_find_non_zero
        cv2.cvtColor = real_cvt
        sys.path.remove(REF)


def _frames(n=20, seed=7):
    from meterelf_tpu import synthetic

    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        pos = [float(p) for p in rng.uniform(0, 10, 4)]
        if i % 5 == 1:
            # carry-correction boundary: fractions near .45/.55 with
            # next-lower digit near the 2/8 thresholds
            pos = [rng.uniform(0, 10),
                   float(int(rng.uniform(0, 10)) + rng.choice([0.44, 0.56])),
                   rng.choice([1.9, 2.1, 7.9, 8.1]),
                   rng.uniform(0, 10)]
            pos = [float(p) for p in pos]
        stub = (2,) if i % 7 == 3 else ()
        off = (int(rng.integers(5, 55)), int(rng.integers(5, 55)))
        f = synthetic.render_frame(pos, offset=off, stub_dials=stub)
        if i % 4 == 2:
            # sparse speckle noise (stresses CCL + largest-component)
            m = rng.random(f.shape[:2]) < 0.001
            f[m] = (40, 40, 200)
        frames.append(f)
    return frames


def test_fuzz_against_reference_oracle(oracle):
    from meterelf_tpu import synthetic
    from meterelf_tpu.errors import ErrCode
    from meterelf_tpu.pipeline.decode import MeterDecoder

    decode_frame, params = oracle
    frames = _frames()
    (x0, y0), (x1, y1) = synthetic.METER_RECT
    crops = np.stack([f[y0:y1, x0:x1] for f in frames])

    dec = MeterDecoder(params, exact=True)
    res = dec.decode_numpy(crops)

    name_order = [s[0] for s in synthetic.DIAL_SPECS]
    mismatches = []
    for i, f in enumerate(frames):
        mv, err_name = decode_frame(f)
        if err_name is None:
            ok_dials = {k for k in mv if k != "value"}
            if "value" in mv:
                if res.err[i] != ErrCode.OK:
                    mismatches.append((i, "oracle ok, ours err",
                                       int(res.err[i])))
                    continue
                if abs(float(res.value[i]) - mv["value"]) > 5e-6:
                    mismatches.append((i, "value", float(res.value[i]),
                                       mv["value"]))
                for d, nm in enumerate(name_order):
                    if abs(float(res.dial_pos[i, d]) - mv[nm]) > 5e-6:
                        mismatches.append((i, f"dial {nm}",
                                           float(res.dial_pos[i, d]),
                                           mv[nm]))
            continue
        expected = {
            "DialsNotFoundError": ErrCode.DIALS_NOT_FOUND,
            "NeedleContoursNotFoundError": ErrCode.NEEDLE_CONTOURS,
            "DialAngleDeterminingError": ErrCode.DIAL_ANGLE,
        }.get(err_name)
        if expected is None:
            mismatches.append((i, "unexpected oracle error", err_name))
        elif res.err[i] != expected:
            mismatches.append((i, "error code", int(res.err[i]), err_name))
    assert not mismatches, mismatches
