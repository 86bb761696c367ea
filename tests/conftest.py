import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding is
# validated without TPU hardware (the driver separately dry-runs the
# multichip path; bench.py runs on the real chip).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

os.environ.setdefault("METERELF_BATCH_SIZE", "8")  # small batches: fast compile

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# The axon TPU plugin ignores JAX_PLATFORMS; pin the default device to the
# (virtual 8-way) CPU backend explicitly so tests never contend for the
# real chip.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import pytest  # noqa: E402

SAMPLE1 = "/root/reference/sample-images1"
SAMPLE2 = "/root/reference/sample-images2"


def _has_samples():
    return os.path.isdir(SAMPLE1)


def pytest_collection_modifyitems(config, items):
    if not _has_samples():
        skip = pytest.mark.skip(reason="reference sample images not available")
        for item in items:
            if "needs_samples" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(scope="session")
def params1():
    from meterelf_tpu.params import Params

    return Params.load(f"{SAMPLE1}/params.yml")


@pytest.fixture(scope="session")
def params2():
    from meterelf_tpu.params import Params

    return Params.load(f"{SAMPLE2}/params.yml")


@pytest.fixture(scope="session")
def decoder1(params1):
    from meterelf_tpu.pipeline.decode import MeterDecoder

    return MeterDecoder(params1, exact=True)
