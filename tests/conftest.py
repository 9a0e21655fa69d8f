"""Test harness: force an 8-device virtual CPU mesh before importing jax.

TPU tests run separately (bench.py / __graft_entry__.py on the real chip); the
unit suite must be hermetic and exercise multi-device sharding on host CPU.
"""
import os

# Force CPU (the ambient environment presets JAX_PLATFORMS=axon, the remote
# TPU tunnel — unit tests must be hermetic and multi-device).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon plugin ignores the JAX_PLATFORMS env var; the config API works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the dominant cost of this suite is XLA
# compiles, which are identical run-to-run.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
