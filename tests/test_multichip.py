"""Multi-chip data-parallel sharding of the decode graph on the virtual
8-device CPU mesh (the one real parallelism axis for this workload —
SURVEY.md §2c: per-image decode is embarrassingly parallel; DP over
batch + psum-class collectives for aggregate metrics)."""
import numpy as np
import jax
import pytest

from meterelf_tpu.parallel.mesh import data_parallel_decoder, make_mesh

pytestmark = pytest.mark.needs_samples


def _cpu_devices():
    return jax.devices("cpu")


def test_eight_virtual_devices():
    assert len(_cpu_devices()) == 8


def test_sharded_decode_matches_single_device(params1, decoder1):
    from meterelf_tpu.io import jpeg as jio
    from glob import glob

    files = sorted(glob("/root/reference/sample-images1/*.jpg"))[:16]
    crops, ok = jio.load_crops(files, params1.meter_rect, 16)

    res_single = decoder1.decode_numpy(crops, ok)

    mesh = make_mesh(_cpu_devices())
    sharded = data_parallel_decoder(decoder1, mesh)
    res_sharded = jax.tree.map(np.asarray, sharded(crops, ok))

    assert np.array_equal(res_single.err, res_sharded.err)
    assert np.array_equal(res_single.value, res_sharded.value)
    assert np.array_equal(res_single.dial_pos, res_sharded.dial_pos)
    assert np.array_equal(res_single.match_val, res_sharded.match_val)
