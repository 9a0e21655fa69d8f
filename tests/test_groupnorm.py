"""GroupNorm32 numerics: the lane-aligned core must match flax nn.GroupNorm.

The rewrite (models/layers.py::_GroupNormCore) changes the reduction
structure for TPU tiling, not the math; this pins equality with flax's
default (use_fast_variance) GroupNorm in f32, tolerance in bf16, across
ranks, group fallbacks, and non-trivial affine params.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from prometheus_tpu.models.layers import GroupNorm32


def _ref_groupnorm(x, scale, bias, groups, eps):
    m = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    p = {"params": {"scale": scale, "bias": bias}}
    return m.apply(p, x.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 32),     # divides
    ((2, 8, 8, 48), 32),     # falls back 32 -> 16
    ((3, 5, 96), 32),        # rank-3
    ((2, 4, 4, 4, 32), 32),  # rank-5
])
def test_groupnorm32_matches_flax_f32(shape, groups):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32) * 3.0 + 1.5
    c = shape[-1]
    g = groups
    while c % g != 0:
        g //= 2
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.3

    m = GroupNorm32(num_groups=groups, eps=1e-5)
    params = m.init(key, x)
    # overwrite with non-trivial affine (paths must match nn.GroupNorm's)
    params = {"params": {"GroupNorm_0": {"scale": scale, "bias": bias}}}
    got = m.apply(params, x)
    want = _ref_groupnorm(x, scale, bias, g, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_groupnorm32_bf16_stats_in_f32():
    x32 = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 64)) * 4 + 100.0
    x = x32.astype(jnp.bfloat16)
    m = GroupNorm32(num_groups=32, eps=1e-5)
    params = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(params, x)
    assert got.dtype == jnp.bfloat16
    want = _ref_groupnorm(x.astype(jnp.float32),
                          jnp.ones((64,)), jnp.zeros((64,)), 32, 1e-5)
    # bf16 rounding on the output only; stats are f32 so the large-mean
    # offset (100) must not poison the normalized values
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2)


def test_groupnorm32_param_path_stable():
    """Checkpoint compat: params live at GroupNorm_0/{scale,bias}."""
    m = GroupNorm32()
    p = m.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 4, 64)))
    leaves = p["params"]["GroupNorm_0"]
    assert set(leaves) == {"scale", "bias"}
    assert leaves["scale"].shape == (64,)
