"""NaN-guard debug utilities (reference vae_hacked.py:20-46 NaN context +
train.py:145 detect_anomaly analogs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.utils.nan_guard import assert_finite, check_finite


def test_assert_finite_raises_and_names_leaf():
    tree = {"ok": np.ones(3), "bad": np.asarray([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite(tree, "batch")
    assert_finite({"ok": np.ones(3), "ints": np.arange(3)}, "batch")


def test_check_finite_composes_inside_jit():
    @jax.jit
    def f(x):
        x = check_finite(x, "mid")
        return x * 2.0

    out = f(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(out), 2.0)
    # non-finite input: still returns (guard prints, never raises/syncs)
    out = f(jnp.asarray([jnp.nan, 1.0, 2.0, 3.0]))
    assert np.isnan(np.asarray(out)[0])
