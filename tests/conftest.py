"""Test configuration: force an 8-virtual-device CPU platform.

Tests never touch the real TPU chip (it is a single exclusively-held
device); distributed tests run on a faked 8-device CPU mesh via
``xla_force_host_platform_device_count``.  The environment's axon boot
forcibly sets ``jax_platforms="axon,cpu"`` at interpreter start, so we
re-force plain CPU before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test draws from a fresh deterministic stream,
    # so results don't depend on test execution order
    return np.random.default_rng(0)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
