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


def _slow_manifest():
    """Measured-slow test ids (>=5 s call+setup on the 1-core container),
    regenerated from a full `--durations=0` run — data-driven rather than
    hand-maintained decorators. Explicit @pytest.mark.slow still works for
    new tests known to be heavy before any timing run."""
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(path):
        return frozenset()
    with open(path) as f:
        return frozenset(
            line.strip()
            for line in f
            if line.strip() and not line.startswith("#")
        )


def pytest_collection_modifyitems(config, items):
    slow = _slow_manifest()
    if not slow:
        return
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if not nodeid.startswith("tests/"):
            # invoked from inside tests/: normalize to repo-relative ids
            nodeid = "tests/" + nodeid
        if nodeid in slow or nodeid.split("[")[0] in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
