"""Test configuration.

Tests run on CPU with 8 virtual devices by default (the "fake backend" the
reference never had — SURVEY.md §4): Pallas kernels execute in interpreter
mode, and the distributed layer is exercised on a virtual 8-device mesh.
Set ``MFA_TPU_TESTS=1`` to run on real TPU hardware instead (kernels compile
via Mosaic; multi-device tests are skipped if only one chip is present).
"""

import os

# Must happen before the first jax backend initialization.  NOTE: env var
# JAX_PLATFORMS alone is not enough in environments whose sitecustomize
# pre-configures a TPU platform — override via jax.config as well.
if os.environ.get("MFA_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if os.environ.get("MFA_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (repo-local, gitignored): the fast tier is
# dominated by XLA compile time on this 1-core box — a warm cache cuts
# the tier's wall time roughly in half across runs.  Disable with
# MFA_COMPILE_CACHE=0.
from metal_flash_attention_plus_tpu.utils.compile_cache import (  # noqa: E402,E501
    enable_persistent_cache,
)

enable_persistent_cache()


def on_cpu() -> bool:
    return jax.default_backend() == "cpu"


@pytest.fixture(scope="session")
def interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode."""
    return on_cpu()


@pytest.fixture(scope="session")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (MFA_SLOW_TESTS=1)")
    config.addinivalue_line("markers", "tpu_only: requires real TPU hardware")


def pytest_collection_modifyitems(config, items):
    run_slow = os.environ.get("MFA_SLOW_TESTS") == "1"
    for item in items:
        if "slow" in item.keywords and not run_slow:
            item.add_marker(pytest.mark.skip(reason="set MFA_SLOW_TESTS=1"))
        if "tpu_only" in item.keywords and on_cpu():
            item.add_marker(pytest.mark.skip(reason="requires TPU"))
