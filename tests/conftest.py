"""Test bootstrap: force JAX onto a virtual 8-device CPU platform.

Mirrors the reference's strategy of running all "distributed" tests
without a cluster (ref: tests/utils.py multi_process_parallel) — here a
single process with 8 virtual CPU devices exercises every mesh/sharding
path (SURVEY.md §4 layer-3).

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress environment
# Don't persist the thousands of tiny XLA:CPU test executables to the
# user cache; the dedicated compile-cache test opts in explicitly.
os.environ.setdefault("VLLM_TPU_COMPILE_CACHE", "0")

# Force CPU even when the ambient env routes JAX at a TPU (axon): tests
# must be host-runnable. Set VLLM_TPU_TEST_ON_TPU=1 to run on real HW.
if os.environ.get("VLLM_TPU_TEST_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

# Full-precision matmuls for numerical parity tests (JAX's default
# CPU/TPU matmul precision is bf16-class, ~1e-3 error at dim 64).
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon PJRT plugin ignores the JAX_PLATFORMS env var; the config
# knob does stick. Without this, "cpu tests" silently run on the TPU.
if os.environ.get("VLLM_TPU_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """The full suite compiles thousands of XLA:CPU executables; the
    accumulated compiler state eventually segfaults LLVM mid-compile
    (observed in quant/test_online.py only when the whole suite runs
    in one process). Dropping jit caches between modules keeps the
    compiler healthy at a small recompile cost."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _reset_ambient_mesh():
    """The runner installs its mesh globally (parallel/mesh); make sure
    no test leaks an EP/TP mesh into the next."""
    yield
    from vllm_tpu.parallel.mesh import set_current_mesh
    set_current_mesh(None)


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual cpu devices, got {devs}"
    return devs
