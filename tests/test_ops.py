"""Kernel-level parity tests vs OpenCV semantics (the unit coverage the
reference lacks; SURVEY.md §4 'implication for the TPU build')."""
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meterelf_tpu.ops import color as color_ops
from meterelf_tpu.ops import components as comp_ops
from meterelf_tpu.ops import morphology as morph_ops
from meterelf_tpu.ops import template as template_ops


def test_hls_matches_host_reference():
    """jnp conversion == the float-path formula (validated byte-exact
    against the goldens end-to-end)."""
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, (64, 64, 3), np.uint8)
    out = np.asarray(color_ops.bgr_to_hls_full(jnp.asarray(bgr), 128))

    from meterelf_tpu.api import _host_hls

    expected = _host_hls(bgr, 128)
    assert np.array_equal(out, expected.astype(np.int32))


def test_hls_close_to_cv2():
    """Sanity: within +-1 LSB of modern cv2 (old-cv2 float path differs
    from modern cv2 by design)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    bgr = rng.integers(0, 256, (64, 64, 3), np.uint8)
    ours = np.asarray(color_ops.bgr_to_hls_full(jnp.asarray(bgr), 0))
    cvs = cv2.cvtColor(bgr, cv2.COLOR_BGR2HLS_FULL).astype(np.int32)
    assert np.abs(ours - cvs).max() <= 1


def test_morphology_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    m = (rng.random((40, 52)) < 0.35)
    k = np.ones((3, 3), np.uint8)
    d_cv = cv2.dilate(m.astype(np.uint8) * 255, k) > 0
    e_cv = cv2.erode(m.astype(np.uint8) * 255, k) > 0
    assert np.array_equal(np.asarray(morph_ops.dilate3(jnp.asarray(m))), d_cv)
    assert np.array_equal(np.asarray(morph_ops.erode3(jnp.asarray(m))), e_cv)


def test_template_locate_first_max_tiebreak():
    scores = jnp.zeros((1, 5, 7)).at[0, 2, 3].set(9.0).at[0, 4, 1].set(9.0)
    mv, x, y = template_ops.locate(scores)
    assert float(mv[0]) == 9.0
    assert (int(x[0]), int(y[0])) == (3, 2)  # first in row-major order


def test_matmul_scorer_matches_conv_scorer():
    rng = np.random.default_rng(3)
    L = rng.integers(0, 256, (2, 150, 160)).astype(np.float32)
    T = rng.integers(0, 256, (40, 60)).astype(np.uint8)
    tz = (T.astype(np.float64) - T.astype(np.float64).mean()).astype(np.float32)
    s_conv = np.asarray(template_ops.match_template_scores(
        jnp.asarray(L), jnp.asarray(tz)))
    s_mm = np.asarray(template_ops.match_template_scores_matmul(
        jnp.asarray(L), jnp.asarray(T), float(T.mean())))
    assert s_conv.shape == s_mm.shape == (2, 111, 101)
    rel = np.abs(s_conv - s_mm).max() / max(1.0, np.abs(s_conv).max())
    assert rel < 1e-4
    assert (s_conv.reshape(2, -1).argmax(1) == s_mm.reshape(2, -1).argmax(1)).all()


def _cv2_needle_region(masked, closed):
    """Reference semantics via cv2 (the oracle)."""
    import cv2

    contours, _ = cv2.findContours(
        masked.astype(np.uint8) * 255, cv2.RETR_EXTERNAL,
        cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    contour = sorted(contours, key=cv2.contourArea)[-1]
    if cv2.contourArea(contour) > 100:
        out = np.zeros_like(masked, np.uint8)
        cv2.drawContours(out, [contour], -1, 255, -1)
        return out > 0
    return closed


@pytest.mark.parametrize("seed", range(8))
def test_components_match_cv2_on_random_blobs(seed):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(seed)
    W = 64
    # synthesize blobby masks: a few filled ellipses + speckle, inside a disk
    yy, xx = np.mgrid[:W, :W]
    disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2
    closed = np.zeros((W, W), bool)
    for _ in range(rng.integers(1, 4)):
        cy, cx = rng.integers(16, 48, 2)
        a, b = rng.integers(3, 14, 2)
        closed |= ((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2 <= 1.0
    closed |= rng.random((W, W)) < 0.02
    masked = closed & disk

    expected = _cv2_needle_region(masked, closed)
    res = comp_ops.analyze(
        jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(disk))
    assert bool(res.has_any) == bool(masked.any())
    if expected is None:
        return
    got = np.asarray(res.needle_region)
    assert np.array_equal(got, expected), f"seed {seed}"


@pytest.mark.parametrize("density", [0.1, 0.3, 0.5])
def test_pallas_ccl_matches_xla_propagation(density):
    """The fused Pallas propagation kernel (ops/pallas_ccl.py) must be
    bit-identical to the XLA path — needle regions, has_any, and the
    per-window convergence bits — including on dense noise that does
    NOT converge (both impls must agree on the failure)."""
    rng = np.random.default_rng(int(density * 100))
    W = 64
    K = 34  # odd pair count + pad-to-group coverage
    yy, xx = np.mgrid[:W, :W]
    disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2
    closed = rng.random((K, W, W)) < density
    masked = closed & disk
    diskb = np.broadcast_to(disk, (K, W, W)).copy()

    dev = jax.config.jax_default_device or jax.devices()[0]
    impl = "pallas" if dev.platform == "tpu" else "pallas_interpret"
    # compiled pallas_call must go through jit (eager dispatch on the
    # tunnel platform lowers it for CPU and refuses)
    run = jax.jit(comp_ops.analyze_batch, static_argnames=("impl",))
    r_x = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
              impl="xla")
    r_p = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
              impl=impl)
    assert np.array_equal(np.asarray(r_x.needle_region),
                          np.asarray(r_p.needle_region))
    assert np.array_equal(np.asarray(r_x.has_any), np.asarray(r_p.has_any))
    assert np.array_equal(np.asarray(r_x.converged),
                          np.asarray(r_p.converged))


@pytest.mark.parametrize("density", [0.08, 0.3])
def test_pallas_stats_matches_sort(density):
    """The VMEM one-hot histogram stats kernel (ops/pallas_stats.py)
    must select the same component as the u16-sort stage — both with
    and without the production per-dial bbox on the sort side (the
    kernel always works full-window; the bbox remap is monotone so the
    selection is identical). K=18 also exercises the pad-to-GW rows."""
    rng = np.random.default_rng(int(density * 1000))
    W = 64
    K = 18
    yy, xx = np.mgrid[:W, :W]
    disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2
    closed = rng.random((K, W, W)) < density
    for k in range(K // 2):  # half the windows get a real blob
        cy, cx = rng.integers(16, 48, 2)
        closed[k] |= ((yy - cy) ** 2 + (xx - cx) ** 2) <= 64
    masked = closed & disk
    diskb = np.broadcast_to(disk, (K, W, W)).copy()

    dev = jax.config.jax_default_device or jax.devices()[0]
    stats = ("hist_pallas" if dev.platform == "tpu"
             else "hist_pallas_interpret")
    run = jax.jit(comp_ops.analyze_batch,
                  static_argnames=("impl", "stats", "static_bbox"))
    args = (jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb))
    r_s = run(*args, impl="xla", stats="sort")
    r_b = run(*args, impl="xla", stats="sort",
              static_bbox=(((8, 8),) * 3, 48))  # K % 3 == 0
    r_p = run(*args, impl="xla", stats=stats)
    for ref in (r_s, r_b):
        assert np.array_equal(np.asarray(ref.needle_region),
                              np.asarray(r_p.needle_region))
        assert np.array_equal(np.asarray(ref.has_any),
                              np.asarray(r_p.has_any))


def test_fused_matcher_matches_v1_plus_boxsum():
    """pallas_match2 (correlation + in-kernel integral-image boxsum)
    must be bit-identical to the v1 kernel + XLA boxsum composition."""
    from meterelf_tpu.ops import pallas_match as pm
    from meterelf_tpu.ops import pallas_match2 as pm2

    dev = jax.config.jax_default_device or jax.devices()[0]
    interpret = dev.platform != "tpu"
    rng = np.random.default_rng(7)
    L = jnp.asarray(
        rng.integers(0, 256, (3, 250, 250)).astype(np.float32))
    T = jnp.asarray(rng.integers(0, 256, (119, 188)).astype(np.uint8))
    tmean = jnp.float32(117.25)

    v1 = jax.jit(functools.partial(pm.match_scores_pallas,
                                   interpret=interpret))(L, T, tmean)
    v2 = jax.jit(functools.partial(pm2.match_scores_pallas_fused,
                                   interpret=interpret))(L, T, tmean)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))


def test_fused_matcher_alt_geometry():
    """The fused matcher is parametric over the padded shape family:
    on the second shipped camera's 220x135 crop its decisions (argmax
    location, near-threshold ordering) must match the XLA matmul
    formulation; raw scores agree to f32 summation-order noise, orders
    of magnitude below the corpus peak gaps (docs/parity.md)."""
    from meterelf_tpu.ops import pallas_match2 as pm2
    from meterelf_tpu.ops import template as template_ops

    assert pm2.fits(135, 220, 119, 188)
    assert not pm2.fits(100, 100, 119, 188)

    dev = jax.config.jax_default_device or jax.devices()[0]
    interpret = dev.platform != "tpu"
    rng = np.random.default_rng(11)
    L = jnp.asarray(
        rng.integers(0, 256, (3, 135, 220)).astype(np.float32))
    T = jnp.asarray(rng.integers(0, 256, (119, 188)).astype(np.uint8))
    tmean = jnp.float32(117.25)

    ref = np.asarray(jax.jit(
        lambda l: template_ops.match_template_scores_matmul(
            l, T, tmean))(L))
    got = np.asarray(jax.jit(functools.partial(
        pm2.match_scores_pallas_fused, interpret=interpret))(L, T, tmean))
    assert got.shape == ref.shape == (3, 17, 33)
    assert np.allclose(got, ref, rtol=1e-4)
    assert np.array_equal(got.reshape(3, -1).argmax(1),
                          ref.reshape(3, -1).argmax(1))


def _isolated_interpret_run(test_name):
    """Run one interpret-mode kernel test in a child pytest process.

    XLA:CPU can crash (SIGSEGV) while COMPILING the giant unrolled
    interpret graphs of the frontend kernels — an upstream compiler bug,
    not a parity failure. In-process that kills the whole pytest run;
    isolated, a compiler crash becomes a diagnosable skip while a real
    parity failure still fails."""
    import subprocess
    import sys

    env = dict(os.environ, METERELF_INTERPRET_INPROC="1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x",
         f"tests/test_ops.py::{test_name}"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1200)
    if r.returncode < 0:
        pytest.skip(
            f"XLA:CPU crashed (signal {-r.returncode}) compiling the "
            "interpret-mode kernel — known upstream compiler bug; this "
            "parity is validated on TPU (test_quad_kernels_match_xla_on_"
            "tpu / experiments/quad_kernels_check.py)")
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]


def test_int8_frontend_kernel_exact():
    """The fused int8-MXU frontend (ops/pallas_frontend.py) must produce
    the argmax of the EXACT integer TM_CCOEFF decomposition, the exact
    single-rounded f32 score, and a correctly rotated superwindow.

    Reference is straight int64 numpy: corr8 = sum (L-128)(T-128),
    box' = window sum of (L-128),
    scores = f32(f32(corr8) + f32(c1*box')) + c0
    (the kernel's exact op sequence, incl. the f64-derived c0 residual
    of the f32-rounded template mean). Replaces the kernel's old bf16
    path which had order-dependent f32 accumulation."""
    from meterelf_tpu import synthetic
    from meterelf_tpu.ops import pallas_frontend as fe
    from meterelf_tpu.ops import color as color_ops

    import os

    dev = jax.config.jax_default_device or jax.devices()[0]
    interpret = dev.platform != "tpu"
    if interpret and not os.environ.get("METERELF_INTERPRET_INPROC"):
        if not os.environ.get("METERELF_FULL_GOLDEN"):
            pytest.skip("interpret-mode compile of the 64-column kernel "
                        "takes minutes on CPU: set METERELF_FULL_GOLDEN=1 "
                        "(runs always on TPU)")
        _isolated_interpret_run("test_int8_frontend_kernel_exact")
        return

    crops = synthetic.render_crops([[1.0, 3.5, 7.2, 9.9]])  # [1,250,250,3]
    tmpl = synthetic.make_template()                        # [119,188] u8
    c32 = crops.astype(np.int64)
    packed = (c32[..., 0] | (c32[..., 1] << 8)
              | (c32[..., 2] << 16)).astype(np.int32)
    tsum = int(tmpl.astype(np.int64).sum())
    tmean = np.float32(np.float64(tsum) / tmpl.size)

    # tracing the 64-column unrolled kernel with jax_default_device set
    # segfaults (C-stack overflow in the placement wrapper); the platform
    # is already pinned by JAX_PLATFORMS, so clear it around the call
    prev_dev = jax.config.jax_default_device
    jax.config.update("jax_default_device", None)
    try:
        mv, mx, my, sw = jax.jit(functools.partial(
            fe.frontend_pallas, interpret=interpret))(
                jnp.asarray(packed), jnp.asarray(tmpl), tmean)
        mv, mx, my, sw = jax.tree.map(np.asarray, (mv, mx, my, sw))
    finally:
        jax.config.update("jax_default_device", prev_dev)

    # exact numpy reference
    L = np.asarray(color_ops.lightness_from_planes(
        jnp.asarray(crops[..., 0]), jnp.asarray(crops[..., 1]),
        jnp.asarray(crops[..., 2]))).astype(np.int64)       # [2,250,250]
    t64 = tmpl.astype(np.int64) - 128
    c1 = np.float32(np.float32(128.0) - tmean)
    c0 = np.float32(128.0 * (np.float64(tsum)
                             - tmpl.size * np.float64(tmean)))
    OH, OW, TH, TW = fe.OH, fe.OW, fe.TH, fe.TW
    for b in range(len(crops)):
        lp = L[b] - 128
        view = np.lib.stride_tricks.sliding_window_view(lp, (TH, TW))
        corr = np.einsum("yxij,ij->yx", view[:OH, :OW], t64)
        box = np.einsum("yxij->yx", view[:OH, :OW])
        scores = (corr.astype(np.float32)
                  + (c1 * box.astype(np.float32)).astype(np.float32)
                  + c0)
        best = np.unravel_index(np.argmax(scores), scores.shape)
        # first-max row-major tie-break
        ties = np.argwhere(scores == scores[best])
        by, bx = ties[np.lexsort((ties[:, 1], ties[:, 0]))][0]
        assert int(my[b]) == by and int(mx[b]) == bx
        assert np.float32(mv[b]) == scores[by, bx]
        # superwindow = packed image rotated so (by, bx) lands at
        # (0, 0); the sw CONTRACT is bit-exact within the template box
        # [0:th, 0:tw] — beyond it, cells may carry rotate-wrap content
        # (pallas_frontend superwindow comment); downstream consumers
        # only ever read inside the box
        pad = np.zeros((fe.H_PAD, fe.W_PAD), np.int32)
        pad[:250, :250] = packed[b]
        rot = np.roll(np.roll(pad, -by, 0), -bx, 1)
        assert np.array_equal(np.asarray(sw[b])[:TH, :TW],
                              rot[:TH, :TW])


GEOM_CAMERAS = {
    # the second shipped camera's shape: 220x135 crop, 188x119 template
    # (/root/reference/sample-images2/params.yml)
    "camera2shape": dict(meter_rect_wh=(220, 135)),
    # a third, deliberately different geometry through the SAME kernel:
    # 210x200 crop, 141x90 template (synthetic.ALT_CAMERA)
    "altcam": dict(alt=True),
}


@pytest.mark.parametrize("cam", sorted(GEOM_CAMERAS))
def test_frontend_kernel_exact_geometries(cam):
    """The generalized frontend kernel (round 3: FrontendGeom replaces
    the (250,250)/(119,188) literals) must produce the exact integer
    TM_CCOEFF argmax/score and a correctly rotated superwindow for
    every geometry in the shape family — here the second shipped
    camera's crop/template shape and the ALT_CAMERA synthetic geometry.
    Same exact-numpy contract as test_int8_frontend_kernel_exact."""
    from meterelf_tpu import synthetic
    from meterelf_tpu.ops import color as color_ops
    from meterelf_tpu.ops import pallas_frontend as fe
    from meterelf_tpu.types import Rect

    import os

    dev = jax.config.jax_default_device or jax.devices()[0]
    interpret = dev.platform != "tpu"
    if interpret and not os.environ.get("METERELF_INTERPRET_INPROC"):
        if not os.environ.get("METERELF_FULL_GOLDEN"):
            pytest.skip("interpret-mode compile of the 64-column kernel "
                        "takes minutes on CPU: set METERELF_FULL_GOLDEN=1 "
                        "(runs always on TPU)")
        _isolated_interpret_run(
            f"test_frontend_kernel_exact_geometries[{cam}]")
        return

    spec = GEOM_CAMERAS[cam]
    if spec.get("alt"):
        camera = synthetic.ALT_CAMERA
    else:
        w, h = spec["meter_rect_wh"]
        (x0, y0) = synthetic.METER_RECT.top_left
        camera = synthetic.SyntheticCamera(
            meter_rect=Rect((x0, y0), (x0 + w, y0 + h)))
    ch = camera.meter_rect.height
    cw = camera.meter_rect.width
    tmpl = camera.make_template()
    geom = fe.geom_for(ch, cw, tmpl.shape[0], tmpl.shape[1])
    assert geom is not None, "geometry must be inside the kernel family"

    crops = camera.render_crops([[1.0, 3.5, 7.2, 9.9],
                                 [0.0, 2.2, 5.5, 8.8]])
    c32 = crops.astype(np.int64)
    packed = (c32[..., 0] | (c32[..., 1] << 8)
              | (c32[..., 2] << 16)).astype(np.int32)
    tsum = int(tmpl.astype(np.int64).sum())
    tmean = np.float32(np.float64(tsum) / tmpl.size)

    prev_dev = jax.config.jax_default_device
    jax.config.update("jax_default_device", None)
    try:
        mv, mx, my, sw = jax.jit(functools.partial(
            fe.frontend_pallas, interpret=interpret,
            crop_hw=(ch, cw)))(
                jnp.asarray(packed), jnp.asarray(tmpl), tmean)
        mv, mx, my, sw = jax.tree.map(np.asarray, (mv, mx, my, sw))
    finally:
        jax.config.update("jax_default_device", prev_dev)

    L = np.asarray(color_ops.lightness_from_planes(
        jnp.asarray(crops[..., 0]), jnp.asarray(crops[..., 1]),
        jnp.asarray(crops[..., 2]))).astype(np.int64)
    t64 = tmpl.astype(np.int64) - 128
    c1 = np.float32(np.float32(128.0) - tmean)
    c0 = np.float32(128.0 * (np.float64(tsum)
                             - tmpl.size * np.float64(tmean)))
    th, tw = tmpl.shape
    for b in range(len(crops)):
        lp = L[b] - 128
        view = np.lib.stride_tricks.sliding_window_view(lp, (th, tw))
        corr = np.einsum("yxij,ij->yx", view[:geom.oh, :geom.ow], t64)
        box = np.einsum("yxij->yx", view[:geom.oh, :geom.ow])
        scores = (corr.astype(np.float32)
                  + (c1 * box.astype(np.float32)).astype(np.float32)
                  + c0)
        best = np.unravel_index(np.argmax(scores), scores.shape)
        ties = np.argwhere(scores == scores[best])
        by, bx = ties[np.lexsort((ties[:, 1], ties[:, 0]))][0]
        assert int(my[b]) == by and int(mx[b]) == bx
        assert np.float32(mv[b]) == scores[by, bx]
        pad = np.zeros((fe.H_PAD, fe.W_PAD), np.int32)
        pad[:ch, :cw] = packed[b]
        rot = np.roll(np.roll(pad, -by, 0), -bx, 1)
        # sw contract: bit-exact within the template box only
        assert np.array_equal(np.asarray(sw[b])[:th, :tw],
                              rot[:th, :tw])


@pytest.mark.parametrize("seed", range(4))
def test_stats_hist_matches_sort(seed):
    """The MXU-histogram largest-component selection must be
    bit-identical to the u16-sort path (including empty windows and
    area ties)."""
    rng = np.random.default_rng(seed)
    W = 64
    K = 12
    yy, xx = np.mgrid[:W, :W]
    disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2
    closed = np.zeros((K, W, W), bool)
    for k in range(K):
        for _ in range(rng.integers(0, 4)):
            cy, cx = rng.integers(12, 52, 2)
            a, b = rng.integers(2, 14, 2)
            closed[k] |= ((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2 <= 1.0
        closed[k] |= rng.random((W, W)) < rng.choice([0.0, 0.02, 0.3])
    masked = closed & disk
    diskb = np.broadcast_to(disk, (K, W, W)).copy()

    run = jax.jit(comp_ops.analyze_batch, static_argnames=("impl", "stats"))
    r_s = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
              impl="xla", stats="sort")
    r_h = run(jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
              impl="xla", stats="hist")
    assert np.array_equal(np.asarray(r_s.needle_region),
                          np.asarray(r_h.needle_region))
    assert np.array_equal(np.asarray(r_s.has_any), np.asarray(r_h.has_any))


def test_rescue_caps_converge_on_adversarial_noise():
    """Dense noise (seed 0, p=0.35, window 0) defeats the corpus-tuned
    caps: the default run must FLAG it (not silently mislabel);
    RESCUE_CAPS must converge and match the cv2 oracle."""
    cv2 = pytest.importorskip("cv2")
    W = 64
    yy, xx = np.mgrid[:W, :W]
    disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2
    rng = np.random.default_rng(0)
    closed = (rng.random((8, W, W)) < 0.35)[0]
    masked = closed & disk

    run = jax.jit(comp_ops.analyze_batch,
                  static_argnames=("impl", "stats", "caps"))
    r_def = run(jnp.asarray(masked[None]), jnp.asarray(closed[None]),
                jnp.asarray(disk[None]), impl="xla")
    assert not bool(r_def.converged[0])  # honest flag, not silence

    r_resc = run(jnp.asarray(masked[None]), jnp.asarray(closed[None]),
                 jnp.asarray(disk[None]), impl="xla",
                 caps=comp_ops.RESCUE_CAPS)
    assert bool(r_resc.converged[0])
    expected = _cv2_needle_region(masked, closed)
    assert np.array_equal(np.asarray(r_resc.needle_region[0]), expected)


def test_decoder_rescue_path_end_to_end():
    """With the default caps sabotaged to 1 pass, decode_numpy must
    detect the non-convergence and transparently re-decode through the
    rescue graph, matching an unsabotaged decode exactly."""
    import tempfile
    from unittest import mock
    from meterelf_tpu import synthetic
    from meterelf_tpu.pipeline.decode import MeterDecoder

    params = synthetic.make_params(tempfile.mkdtemp())
    crops = synthetic.render_crops(
        [[1.0, 3.5, 7.2, 9.9], [0.0, 2.5, 5.0, 7.5]])

    good = MeterDecoder(params).decode_numpy(crops)
    assert bool(good.converged.all())

    with mock.patch.object(comp_ops, "K_LABEL_HYBRID", 1), \
            mock.patch.object(comp_ops, "K_OUTSIDE_HYBRID", 1), \
            mock.patch.object(comp_ops, "K_FILL", 1):
        weak = MeterDecoder(params)
        res = weak.decode_numpy(crops)
    assert bool(res.converged.all())
    assert np.array_equal(res.value, good.value)
    assert np.array_equal(res.err, good.err)
    assert np.array_equal(res.dial_pos, good.dial_pos)


def test_quad_kernels_match_xla_on_tpu():
    """Fused windows+quad-CCL kernels vs the XLA window stage + pair
    CCL: bit-equality of masks, owner keys, and convergence (TPU only —
    CPU backends fuse f32 HLS graphs with excess precision per graph
    STRUCTURE, so differently-shaped graphs legitimately differ there;
    see experiments/quad_kernels_check.py)."""
    dev = jax.config.jax_default_device or jax.devices()[0]
    if dev.platform != "tpu":
        pytest.skip("quad-kernel equality is defined on strict-f32 TPU")
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "experiments/quad_kernels_check.py"],
        capture_output=True, text=True, timeout=1140, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert out.count("equal: True") >= 16 and "False" not in out, out


def test_static_center_promotion_guard(params1, monkeypatch):
    """Centers are promoted to a fused static 5x5 slice only when the
    slice stays in bounds for every dial; an edge-hugging center falls
    back to the (clamping) dynamic_slice path instead of silently
    slicing an empty/wrong window."""
    from meterelf_tpu.pipeline.decode import MeterDecoder

    assert MeterDecoder(params1)._static_kwargs["static_centers"] is not None

    pa = params1.arrays()
    bad = np.asarray(pa.centers_int).copy()
    bad[0] = (1, 5)  # within 2 px of the window's left edge
    pa_bad = pa._replace(centers_int=bad)
    monkeypatch.setattr(type(params1), "arrays", lambda self: pa_bad)
    dec = MeterDecoder(params1)
    assert dec._static_kwargs["static_centers"] is None


@pytest.mark.parametrize("density", [0.08, 0.3, 0.55])
def test_fused_stats_chain_matches_xla(density):
    """The fused-stats quad chain (pack_closed okey3 -> in-kernel cell
    contributions -> keymax/has_any -> region derived at read points)
    must reproduce analyze_batch's needle_region/has_any/converged
    bit-for-bit. Runs the Pallas kernels in interpret mode off-TPU."""
    from meterelf_tpu.ops import pallas_stats
    from meterelf_tpu.ops.pallas_ccl import propagate_quads

    rng = np.random.default_rng(int(density * 7919))
    W = 64
    B = 9   # odd: exercises the pad-to-GQ path
    K = 4 * B
    yy, xx = np.mgrid[:W, :W]
    disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 23 ** 2
    closed = rng.random((K, W, W)) < density
    for k in range(K // 2):  # half the windows get a real blob
        cy, cx = rng.integers(16, 48, 2)
        closed[k] |= ((yy - cy) ** 2 + (xx - cx) ** 2) <= 64
    masked = closed & disk
    diskb = np.broadcast_to(disk, (K, W, W)).copy()

    dev = jax.config.jax_default_device or jax.devices()[0]
    interp = dev.platform != "tpu"

    bits = (masked.astype(np.int32) + 2 * diskb.astype(np.int32)
            + 4 * closed.astype(np.int32))
    bits_q = (bits.reshape(B, 4, W, W).transpose(0, 2, 1, 3)
              .reshape(B, W, 4 * W))
    okey_q, conv_q = jax.jit(
        functools.partial(propagate_quads, interpret=interp,
                          pack_closed=True))(jnp.asarray(bits_q))
    okey3 = np.asarray(
        (jnp.asarray(okey_q).reshape(B, W, 4, W).transpose(0, 2, 1, 3)
         .reshape(K, W, W)))
    km, hasany = jax.jit(functools.partial(
        pallas_stats.stats_select_fused, interpret=interp))(
            jnp.asarray(okey3))
    km, hasany = np.asarray(km), np.asarray(hasany)

    # materialize the region exactly as angles.read_dial_from_okey does
    owner = okey3 >> 3
    closed_bit = (okey3 >> 2) & 1
    valid = km >= 0
    big = valid & ((km >> 12) > 200)
    sel = np.where(valid, km & 4095, W * W)
    region = np.where(big[:, None, None],
                      owner == sel[:, None, None], closed_bit != 0)

    ref = jax.jit(comp_ops.analyze_batch, static_argnames=("impl",))(
        jnp.asarray(masked), jnp.asarray(closed), jnp.asarray(diskb),
        impl="xla")
    assert np.array_equal(region, np.asarray(ref.needle_region))
    assert np.array_equal(hasany, np.asarray(ref.has_any))
    assert np.array_equal(np.asarray(conv_q).reshape(K),
                          np.asarray(ref.converged))

    # the bbox-restricted contraction (disk_row_spans) is bit-identical:
    # all support pixels live inside the disk mask rows
    spans = pallas_stats.disk_row_spans(
        np.broadcast_to(disk, (4, W, W)))
    km2, hasany2 = jax.jit(functools.partial(
        pallas_stats.stats_select_fused, interpret=interp,
        row_spans=spans))(jnp.asarray(okey3))
    assert np.array_equal(km, np.asarray(km2))
    assert np.array_equal(hasany, np.asarray(hasany2))

    # the pre-sliced i16 feed (uniform-R span rows, biased i16) is
    # bit-identical as well — the knob-gated alternate feed
    # (pipeline/decode.py _STATS_SLICED, default off; measured neutral)
    spans_u = pallas_stats.uniform_row_spans(spans)
    R = spans_u[0][1]
    ok16 = ((jnp.asarray(okey_q) - pallas_stats.I16_BIAS)
            .astype(jnp.int16))
    parts = [jax.lax.slice(ok16, (0, y0, d * W),
                           (B, y0 + R, (d + 1) * W))
             for d, (y0, _) in enumerate(spans_u)]
    okf = jnp.stack(parts, axis=1).reshape(K, R * W)
    km3, hasany3 = jax.jit(functools.partial(
        pallas_stats.stats_select_fused, interpret=interp,
        row_spans=spans, sliced_base=spans_u))(okf)
    assert np.array_equal(km, np.asarray(km3))
    assert np.array_equal(hasany, np.asarray(hasany3))


def test_read_dial_from_okey_matches_read_dial(params1):
    """Gather-point region derivation == materialized-region read_dial
    on every dial geometry, including no-candidate and small-blob
    windows (closed-mask fallback)."""
    from meterelf_tpu.ops import angles as angles_ops

    pa = params1.arrays()
    rng = np.random.default_rng(42)
    W = 64
    N = W * W
    yy, xx = np.mgrid[:W, :W]

    for case in range(8):
        d = case % 4
        closed = rng.random((W, W)) < 0.15
        if case < 6:  # real needle blob in most cases
            cy, cx = rng.integers(20, 44, 2)
            closed |= ((yy - cy) ** 2 + (xx - cx) ** 2) <= (
                100 if case < 4 else 16)  # small blob: area <= 100 branch
        disk = np.asarray(pa.mask_full[d])
        masked = closed & disk

        comp = jax.jit(comp_ops.analyze_batch, static_argnames=("impl",))(
            jnp.asarray(masked[None]), jnp.asarray(closed[None]),
            jnp.asarray(disk[None]), impl="xla")
        region = np.asarray(comp.needle_region[0])

        # synthesize okey3 + keymax for the same window from XLA pieces
        okey, _ = comp_ops._propagate_xla(
            jnp.asarray(masked[None]), jnp.asarray(disk[None]))
        okey = np.asarray(okey[0])
        okey3 = ((okey >> 2) * 8 + closed.astype(np.int32) * 4
                 + (okey & 3))
        contrib = np.asarray(comp_ops._cell_contrib(
            jnp.asarray((okey >> 2)[None]), N)[0])
        owner = okey >> 2
        cand = np.unique(owner[(okey & 1) != 0])
        if cand.size:
            a2 = np.asarray(
                [contrib[owner == o].sum() for o in cand])
            kk = a2 * 4096 + cand
            km = np.int32(kk.max())
        else:
            km = np.int32(-1)

        args = (pa.disk_idx[d], pa.disk_valid[d],
                pa.disk_sx2[d], pa.disk_sy2[d],
                pa.ann_idx[d], pa.ann_valid[d],
                pa.ann_x[d], pa.ann_y[d],
                pa.ann_angle[d], pa.ann_sqd[d],
                pa.neg_sign[d], pa.zero_turn[d])
        r_ref = jax.jit(angles_ops.read_dial)(
            jnp.asarray(region.reshape(N)), *map(jnp.asarray, args))
        r_ok = jax.jit(angles_ops.read_dial_from_okey)(
            jnp.asarray(okey3.reshape(N)), jnp.asarray(km),
            *map(jnp.asarray, args))
        assert bool(r_ref.readable) == bool(r_ok.readable), case
        assert float(r_ref.position) == float(r_ok.position), case


def test_merged_frontend_windows_matches_split():
    """frontend_windows_pallas (superwindow stays in VMEM) must equal
    the frontend_pallas + window_bits_quads composition bit-for-bit:
    same argmax/score and same packed window-bit quad."""
    import os

    from meterelf_tpu import synthetic
    from meterelf_tpu.ops import pallas_frontend as fe
    from meterelf_tpu.ops import pallas_windows as pw
    from meterelf_tpu.params import Params

    dev = jax.config.jax_default_device or jax.devices()[0]
    interpret = dev.platform != "tpu"
    if interpret and not os.environ.get("METERELF_INTERPRET_INPROC"):
        if not os.environ.get("METERELF_FULL_GOLDEN"):
            pytest.skip("interpret-mode compile of the 64-column kernel "
                        "takes minutes on CPU: set METERELF_FULL_GOLDEN=1 "
                        "(runs always on TPU)")
        _isolated_interpret_run("test_merged_frontend_windows_matches_split")
        return

    import tempfile
    params = synthetic.make_params(tempfile.mkdtemp())
    pa = params.arrays()
    origins = tuple((int(x), int(y)) for x, y in np.asarray(pa.win_origin))
    centers = tuple((int(x), int(y)) for x, y in np.asarray(pa.centers_int))
    crops = synthetic.render_crops([[1.0, 3.5, 7.2, 9.9],
                                    [0.0, 2.2, 5.5, 8.8]])
    c32 = crops.astype(np.int64)
    packed = (c32[..., 0] | (c32[..., 1] << 8)
              | (c32[..., 2] << 16)).astype(np.int32)
    tmpl = np.asarray(pa.template_u8)
    tmean = np.float32(np.float64(tmpl.astype(np.int64).sum()) / tmpl.size)
    disk_quad = jnp.asarray(np.concatenate(
        [np.asarray(pa.mask_full[i]).astype(np.int32) for i in range(4)],
        axis=1))

    prev_dev = jax.config.jax_default_device
    jax.config.update("jax_default_device", None)
    try:
        mv, mx, my, sw = jax.tree.map(np.asarray, jax.jit(
            functools.partial(fe.frontend_pallas, interpret=interpret))(
                jnp.asarray(packed), jnp.asarray(tmpl), tmean))
        # origins/centers are static python-int geometry (the kernels
        # call int() on them) — close over them, never trace them
        bits_split = np.asarray(jax.jit(functools.partial(
            pw.window_bits_quads, origins=origins, centers=centers,
            interpret=interpret))(
                jnp.asarray(sw), disk_quad, jnp.asarray(pa.color_range),
                pa.hue_shift))
        mv2, mx2, my2, bits_m = jax.tree.map(np.asarray, jax.jit(
            functools.partial(fe.frontend_windows_pallas,
                              origins=origins, centers=centers,
                              interpret=interpret))(
                jnp.asarray(packed), jnp.asarray(tmpl), tmean, disk_quad,
                jnp.asarray(pa.color_range), pa.hue_shift))
    finally:
        jax.config.update("jax_default_device", prev_dev)

    assert np.array_equal(mv, mv2)
    assert np.array_equal(mx, mx2) and np.array_equal(my, my2)
    assert np.array_equal(bits_split, bits_m)
