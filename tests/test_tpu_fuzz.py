"""On-chip fuzz gate for the full Pallas stack (METERELF_TEST_TPU=1).

The CPU oracle fuzz (tests/test_oracle_fuzz.py) validates the XLA
decode paths against the reference package executed as an oracle — but
by design it never runs the Pallas kernels (compiled Pallas is
TPU-only). This gate closes that hole transitively ON THE REAL CHIP:
the same adversarial frame generator (tests/fuzz_frames.py) drives
>= 256 frames per camera through

  - the FULL Pallas path (conv_precision="pallas": fused frontend
    kernel, quad window masks, lockstep CCL, fused stats, okey angle
    gathers), and
  - the XLA path (conv_precision="matmul") the oracle fuzz validated,

and requires bit-identical readings / error codes / argmax locations.
A second leg re-encodes the frames as baseline 4:2:0 JPEGs and compares
the coefficient feed (host entropy decode + device JPEG back-half,
fused Pallas tail where the geometry gate admits it) against the pixel
path on the SAME bytes — covering ops/pallas_jpeg.py off-corpus.

Run:  METERELF_TEST_TPU=1 python -m pytest tests/test_tpu_fuzz.py -v
Scale: METERELF_TPU_FUZZ_N=512 for bigger campaigns.

Reference analog: the golden-stdout strategy this extends,
/root/reference/tests/test_meterelf.py:39-96.
"""
import io as _io
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("METERELF_TEST_TPU"),
    reason="on-chip gate (METERELF_TEST_TPU=1); the CPU oracle fuzz "
           "covers the XLA paths")

_N = int(os.environ.get("METERELF_TPU_FUZZ_N", "256"))
_CHUNK = 128


def _cameras():
    from meterelf_tpu import synthetic

    return [("default", synthetic.DEFAULT_CAMERA),
            ("alt", synthetic.ALT_CAMERA)]


@pytest.fixture(scope="module", params=["default", "alt"])
def camera_setup(request, tmp_path_factory):
    from meterelf_tpu import synthetic

    camera = dict(_cameras())[request.param]
    d = str(tmp_path_factory.mktemp(f"tpu_fuzz_{request.param}"))
    params = camera.make_params(d)
    return camera, params


def _decode_chunked(dec, crops, ok=None):
    """Decode [N, ...] crops through a fixed-CHUNK compiled graph."""
    fields = None
    for i0 in range(0, len(crops), _CHUNK):
        part = crops[i0:i0 + _CHUNK]
        okp = None if ok is None else ok[i0:i0 + _CHUNK]
        if len(part) < _CHUNK:
            reps = _CHUNK - len(part)
            part = np.concatenate(
                [part, np.repeat(part[-1:], reps, axis=0)])
            if okp is not None:
                okp = np.concatenate([okp, np.repeat(okp[-1:], reps)])
        r = dec.decode_numpy(part, okp)
        fields = (r if fields is None
                  else type(r)(*[np.concatenate([a, b])
                                 for a, b in zip(fields, r)]))
    return type(fields)(*[a[:len(crops)] for a in fields])


def _assert_results_equal(a, b, label):
    from fuzz_frames import assert_results_equal

    assert_results_equal(a, b, label)


def test_pallas_path_matches_xla_path_on_chip(camera_setup):
    """>= _N fuzz frames: full Pallas stack == XLA stack, bit-identical
    (the XLA stack is reference-oracle-validated on CPU; equality here
    extends that insurance to the kernels, off-corpus, on silicon)."""
    import jax
    from fuzz_frames import fuzz_frames
    from meterelf_tpu.pipeline.decode import MeterDecoder

    assert jax.devices()[0].platform == "tpu", "gate needs the real chip"
    camera, params = camera_setup
    frames = fuzz_frames(camera, _N, seed=11)
    (x0, y0), (x1, y1) = camera.meter_rect
    crops = np.stack([f[y0:y1, x0:x1] for f in frames])

    dec_p = MeterDecoder(params, exact=True, conv_precision="pallas")
    dec_x = MeterDecoder(params, exact=True, conv_precision="matmul")
    res_p = _decode_chunked(dec_p, crops)
    res_x = _decode_chunked(dec_x, crops)
    _assert_results_equal(res_p, res_x, "pallas vs xla")
    # the campaign must exercise real decode diversity, not one regime
    assert len(set(res_p.err.tolist())) >= 2, "degenerate fuzz batch"


def test_jpeg_backhalf_matches_pixel_path_on_chip(camera_setup):
    """Fuzz frames re-encoded as baseline 4:2:0 JPEGs: the coefficient
    feed (host entropy decode + device dequant/IDCT/upsample/color,
    fused Pallas tail where admitted) must produce the same readings as
    the pixel path decoding the same bytes with libjpeg."""
    import jax
    from PIL import Image
    from fuzz_frames import fuzz_frames
    from meterelf_tpu.io import jpeg as jio
    from meterelf_tpu.ops import jpegdec
    from meterelf_tpu.pipeline.decode import (MeterDecoder,
                                              make_coef_decode_fn)

    assert jax.devices()[0].platform == "tpu", "gate needs the real chip"
    camera, params = camera_setup
    n = max(128, _N // 2)
    frames = fuzz_frames(camera, n, seed=23)
    frame_wh = (camera.frame_w, camera.frame_h)

    datas = []
    for f in frames:
        buf = _io.BytesIO()
        Image.fromarray(f[:, :, ::-1]).save(
            buf, "JPEG", quality=92, subsampling=2)
        datas.append(buf.getvalue())

    dec = MeterDecoder(params, exact=True, conv_precision="pallas")
    step, win, pad_hw = make_coef_decode_fn(dec, frame_wh)
    fused = jpegdec.fused_tail_ok(
        win, pad_hw if pad_hw != (params.meter_rect.height,
                                  params.meter_rect.width) else None)

    res_c = None
    res_px = None
    for i0 in range(0, n, _CHUNK):
        chunk = datas[i0:i0 + _CHUNK]
        chunk = chunk + [chunk[-1]] * (_CHUNK - len(chunk))
        feed = jio.load_coef_feed(
            chunk, params.meter_rect, frame_wh, dec.feed_pad_hw,
            num_threads=2)
        rc = jax.tree.map(
            np.asarray, step(dec.param_arrays, *feed))
        assert rc.converged.all(), "CCL non-convergence under fuzz"
        pk, pok = jio.load_packed_crops_from_bytes(
            chunk, params.meter_rect, dec.feed_pad_hw, num_threads=2)
        rp = dec.decode_numpy(pk, pok)
        res_c = (rc if res_c is None else
                 type(rc)(*[np.concatenate([a, b])
                            for a, b in zip(res_c, rc)]))
        res_px = (rp if res_px is None else
                  type(rp)(*[np.concatenate([a, b])
                             for a, b in zip(res_px, rp)]))
    res_c = type(res_c)(*[a[:n] for a in res_c])
    res_px = type(res_px)(*[a[:n] for a in res_px])
    _assert_results_equal(
        res_c, res_px, f"coef(fused_tail={fused}) vs pixel")
