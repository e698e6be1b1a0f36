"""Test harness: force an 8-device virtual CPU mesh so every sharding
test runs without TPU hardware (the reference's tests hard-require CUDA;
ours must not — SURVEY §4)."""

import os

# Force CPU even when the host environment preselects an accelerator
# platform (the driver exports JAX_PLATFORMS=axon). jax may already be
# imported by a pytest plugin, but backends initialize lazily, so the
# config route still wins as long as no devices were touched yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: CPU compiles of the big generator graphs
# dominate test wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Parity tests compare against fp32 torch; this backend's default matmul
# precision is bf16-like even on CPU, so force full precision under test.
# Production code chooses precision per-op (geometry: HIGHEST; conv nets:
# backend default for MXU throughput).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from impersonator_tpu import assets as assets_mod  # noqa: E402


@pytest.fixture(scope="session")
def assets():
    return assets_mod.synthetic_assets()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
