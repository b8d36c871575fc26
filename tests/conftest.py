"""Test harness: force an 8-device virtual CPU platform before jax import so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the suite is dominated by repeated tiny-model
# compiles; cache them across runs (and across tests within a run).
_CACHE_DIR = os.path.expanduser("~/.cache/motioncraft_jax_cache_tests")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # older jax without these flags: run uncached
    pass

# This XLA:CPU build defaults f32 matmuls to a bf16-grade 3-pass (measured
# ~2e-3 relative error); force true f32 accumulation so golden/parity tests
# compare real numbers, not rounding artifacts.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
