"""Native JPEG input-pipeline tests: region-decode byte parity vs full
decode (including the corrupt/truncated frames), loader equivalence,
and fallback behavior."""
import os
from glob import glob

import numpy as np
import pytest

from meterelf_tpu.io import jpeg as jio
from meterelf_tpu.params import Params
from meterelf_tpu.types import Rect

S1 = "/root/reference/sample-images1"
S2 = "/root/reference/sample-images2"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(S1), reason="sample corpus not mounted")


def _params(sdir):
    return Params.load(os.path.join(sdir, "params.yml"))


def _some_files(sdir, k=8):
    files = sorted(glob(os.path.join(sdir, "*.jpg")))
    # always include the two corrupt frames (sorted first in S1)
    return files[:k]


@pytest.mark.parametrize("sdir", [S1, S2])
def test_region_decode_matches_full(sdir):
    """decode_region == crop(decode_file) byte-for-byte (the margin
    preserves fancy-upsampling context; the full corpus was validated
    once — this pins a representative subset incl. truncated files)."""
    params = _params(sdir)
    rect = params.meter_rect
    n = len(glob(os.path.join(sdir, "*.jpg"))) if os.environ.get(
        "METERELF_FULL_GOLDEN") else 8
    for fn in _some_files(sdir, n):
        full = jio.decode_file(fn)
        reg = jio.decode_region(fn, rect)
        if full is None:
            assert reg is None or reg.shape == (rect.height, rect.width, 3)
            continue
        assert reg is not None, fn
        assert np.array_equal(jio.crop_rect(full, rect), reg), fn


def test_threaded_loader_matches_serial():
    params = _params(S1)
    files = _some_files(S1, 12)
    c1, ok1 = jio.load_crops(files, params.meter_rect)
    c2, ok2 = jio.load_crops_threaded(files, params.meter_rect,
                                      num_threads=4)
    assert np.array_equal(ok1, ok2)
    assert np.array_equal(c1, c2)


def test_region_fallback_for_undersized_frames(tmp_path):
    """A frame smaller than the meter rect takes the fallback path and
    is flagged load_ok=False (graceful degradation; the reference would
    crash on the slice)."""
    from PIL import Image

    small = tmp_path / "small.jpg"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(str(small))
    big_rect = Rect((50, 160), (300, 410))
    crops, ok = jio.load_crops([str(small)], big_rect)
    assert not ok[0]
    crops, ok = jio.load_crops_threaded([str(small)], big_rect)
    assert not ok[0]


def test_missing_file_flagged():
    params = _params(S1)
    crops, ok = jio.load_crops(["/does/not/exist.jpg"], params.meter_rect)
    assert not ok[0]
    crops, ok = jio.load_crops_threaded(
        ["/does/not/exist.jpg"], params.meter_rect)
    assert not ok[0]
