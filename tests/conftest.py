"""Test configuration: force an 8-device virtual CPU mesh.

NOTE: in this environment the JAX_PLATFORMS env var is overridden by the
TPU plugin; the only reliable way to force CPU is jax.config.update before
the backend initializes, which this conftest guarantees by running before
any test module imports jax.

Set NSX_TPU_TESTS=1 to KEEP the real TPU backend so the hardware-gated
tests run under pytest, e.g.:
    NSX_TPU_TESTS=1 python -m pytest tests/test_itemgrid.py -k tpu
(multi-device CPU-mesh tests will skip in that mode: one chip only).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import subprocess

_here = os.path.dirname(os.path.abspath(__file__))
# build the native helpers fresh so tests never exercise a stale .so
# (binaries are gitignored; numpy fallbacks cover their absence)
subprocess.run(["make", "-C", os.path.join(_here, "..", "native"), "-s"],
               check=False, capture_output=True)

import jax  # noqa: E402

if not os.environ.get("NSX_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Default profile: skip @pytest.mark.slow (long interpret-mode
    kernel runs) so `pytest -q` finishes in minutes on a small box;
    every engine keeps fast coverage. Full profile: NSX_FULL_TESTS=1
    (or an explicit -m selection)."""
    import pytest

    if os.environ.get("NSX_FULL_TESTS") or config.option.markexpr:
        return
    skip = pytest.mark.skip(
        reason="slow profile: set NSX_FULL_TESTS=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
