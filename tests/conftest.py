"""Test configuration.

Tests run on CPU by default with 8 virtual devices so the multi-chip
sharding paths (parallel/) are exercised without TPU hardware, as the
driver's ``dryrun_multichip`` does.  Set ``MRI_TPU_TESTS=1`` to run on real
TPU hardware instead (enables the ``tpu``-marked tests).

Environment variables must be set before jax initializes its backends,
hence the top-of-file manipulation.
"""

import os

_USE_TPU = os.environ.get("MRI_TPU_TESTS", "0") == "1"
if not _USE_TPU:
    # The axon TPU plugin presets JAX_PLATFORMS=axon and ignores an env
    # override, so force the platform through the config API instead.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: test requires real TPU hardware (MRI_TPU_TESTS=1)")
    config.addinivalue_line(
        "markers", "slow: long-running test; deselect with -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    skip_tpu = pytest.mark.skip(reason="requires real TPU (set MRI_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture(scope="session")
def f64():
    """Enable float64 for oracle-precision tests (CPU only)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
