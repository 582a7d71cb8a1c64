"""Test configuration: run everything on an 8-device virtual CPU mesh.

Set before jax import so multi-device sharding tests work without TPUs
(the standard JAX fake-backend trick — SURVEY.md §4).
"""

import os

# NOTE: in this image jax is pre-imported at interpreter startup (axon
# sitecustomize), so env-var changes alone don't take effect — we must also
# flip the platform through jax.config before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-geometry parity / subprocess tests excluded from the "
        "fast tier (make test-fast runs -m 'not slow')",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
