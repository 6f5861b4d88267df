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


def _slow_prefixes():
    """Durations-informed slow tier: tests/slow_tests.txt lists the
    node-id prefixes (function level, parametrizations included) of
    every test measured >= 15 s on this 1-CPU box — two thirds of the
    suite's wall time in ~10% of its tests.  The per-commit gate is
    ``pytest -m "not slow"`` (< 10 min); the full suite runs at the
    round snapshot.  Regenerate the list from a ``--durations=0`` run
    when the distribution shifts."""
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(path):
        return ()
    with open(path) as f:
        return tuple(line.strip() for line in f if line.strip())


def pytest_collection_modifyitems(config, items):
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    skip_tpu = pytest.mark.skip(reason="requires real TPU (set MRI_TPU_TESTS=1)")
    slow = _slow_prefixes()
    mark_slow = pytest.mark.slow
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
        base = item.nodeid.split("[")[0]
        if base in slow:
            item.add_marker(mark_slow)


@pytest.fixture(scope="session")
def f64():
    """Enable float64 for oracle-precision tests (CPU only)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
