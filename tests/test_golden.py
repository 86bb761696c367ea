"""Golden-output parity — the backbone test strategy inherited from the
reference (tests/test_meterelf.py:39-96, tolerance 0.00 = byte-exact).

The fast suite checks a representative subset (both corrupt frames, a
snapshot frame, boundary-value frames). Set METERELF_FULL_GOLDEN=1 to run
all 304 images of both sample sets (several minutes on CPU; the CI driver
runs the subset).
"""
import io
import os
import contextlib
from glob import glob

import pytest

from meterelf_tpu.cli import main

pytestmark = pytest.mark.needs_samples

SAMPLE1 = "/root/reference/sample-images1"
SAMPLE2 = "/root/reference/sample-images2"
GOLDEN1 = "/root/reference/integration-tests/test_all_sample_images.expected_stdout"
GOLDEN2 = "/root/reference/tests/sample-images2_stdout.txt"

SUBSET1 = [
    "20180814021309-01-e01.jpg",        # corrupt: match val = 0.0
    "20180814021310-00-e02.jpg",        # corrupt: match val = 17495704.0
    "20180814021357-00-e01.jpg",        # 905.126
    "20180814023853-00-e08.jpg",        # 932.800
    "20180814030000-e01-snapshot.jpg",  # snapshot frame, 932.831
    "20180814215230-01-e136.jpg",       # debug-test frame, 253.623
    "20180815012802-00-e150.jpg",       # 294.051
    "20180819195956-01-e700.jpg",       # 344.243
]


def golden_lines(path):
    with open(path) as fp:
        return dict(
            line.split(": ", 1) for line in fp.read().splitlines())


def run_cli(sample_dir, files):
    old = os.getcwd()
    os.chdir(sample_dir)
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["meterelf", "params.yml"] + files)
        return buf.getvalue().splitlines()
    finally:
        os.chdir(old)


def test_golden_subset_sample1():
    golden = golden_lines(GOLDEN1)
    got = run_cli(SAMPLE1, SUBSET1)
    assert len(got) == len(SUBSET1)
    for line, fn in zip(got, SUBSET1):
        assert line == f"{fn}: {golden[fn]}"


@pytest.mark.skipif(
    not os.environ.get("METERELF_FULL_GOLDEN"),
    reason="set METERELF_FULL_GOLDEN=1 for the full 304-image suite",
)
@pytest.mark.parametrize("sample_dir,golden_file", [
    (SAMPLE1, GOLDEN1),
    (SAMPLE2, GOLDEN2),
])
def test_golden_full(sample_dir, golden_file):
    files = sorted(
        os.path.basename(p) for p in glob(os.path.join(sample_dir, "*.jpg")))
    got = run_cli(sample_dir, files)
    expected = open(golden_file).read().splitlines()
    assert got == expected
