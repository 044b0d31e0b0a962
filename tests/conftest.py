"""Test bootstrap: force JAX onto a virtual 8-device CPU platform.

Mirrors the reference's strategy of running all "distributed" tests
without a cluster (ref: tests/utils.py multi_process_parallel) — here a
single process with 8 virtual CPU devices exercises every mesh/sharding
path (SURVEY.md §4 layer-3).

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual cpu devices, got {devs}"
    return devs
