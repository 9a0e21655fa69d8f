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
# NOTE: no persistent compilation cache — entries compiled through the axon
# TPU tunnel target a different host arch and reload with SIGILL-risk
# warnings; CPU compiles here are fast enough.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


# Heavy modules/tests (>20 s each on the 1-core CI host) are auto-marked
# ``slow`` so ``pytest -m "not slow"`` is a per-commit quick gate (~7 min);
# the full suite (~26 min) stays the pre-merge bar.
_SLOW_MODULES = {
    "test_train_from_disk", "test_3d_mode", "test_gmldm_system",
    "test_refiners", "test_training", "test_rendering_loss",
    "test_reference_parity", "test_image_to_3d", "test_lpips_depth",
    "test_serve_gallery",
}
_SLOW_TESTS = {
    "test_gsdecoder_gradients", "test_unet_cross_view_mixing",
    "test_pallas_vjp_matches_xla_grads", "test_gradients_flow_and_are_finite",
    "test_cross_view_dit_views_interact",
    "test_view_sharded_train_loss_and_grads_match",
    "test_generate_view_sharded_end_to_end",
    "test_dpmpp_beats_euler_at_coarse_steps",
    "test_dpmpp_converges_on_vpred_schedule",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES or item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
