import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding is
# validated without TPU hardware (the driver separately dry-runs the
# multichip path; bench.py runs on the real chip). The ambient session
# env points jax at the tunneled TPU (JAX_PLATFORMS=axon plus a PJRT
# plugin injected via PYTHONPATH sitecustomize); when that tunnel is
# wedged, ANY backend init — even jax.devices("cpu") — hangs for
# minutes. Tests are CPU-by-design, so force the platform, strip the
# plugin from children's PYTHONPATH, and deregister its already-loaded
# backend factory before the first backend init. METERELF_TEST_TPU=1
# opts out of all of that to run the TPU-marked tests on the real chip
# (e.g. tests/test_multichip.py's sharding x Pallas composition test).
_TPU_TESTS = bool(os.environ.get("METERELF_TEST_TPU"))
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
if not _TPU_TESTS and (
        "--xla_force_host_platform_device_count"
        not in os.environ.get("XLA_FLAGS", "")):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
if not _TPU_TESTS and ".axon_site" in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in os.environ["PYTHONPATH"].split(os.pathsep)
        if ".axon_site" not in p
    )

os.environ.setdefault("METERELF_BATCH_SIZE", "8")  # small batches: fast compile

import jax  # noqa: E402

if not _TPU_TESTS:
    try:  # this process already ran the plugin's sitecustomize; unhook it
        from jax._src import xla_bridge as _xb  # noqa: E402

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass
    # sitecustomize imports jax itself and pins jax_platforms in config,
    # which shadows the env var — override the config value as well.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

# Pin the default device to the (virtual 8-way) CPU backend explicitly
# so tests never contend for the real chip (under METERELF_TEST_TPU the
# TPU-marked tests pick their device themselves).
if not _TPU_TESTS:
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
