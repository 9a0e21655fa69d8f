import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.models.depth_anything import DepthAnythingV2, make_depth_fn
from prometheus_tpu.models.lpips import LPIPS, make_lpips_fn


def test_lpips_zero_for_identical(key):
    fn = make_lpips_fn(key)
    x = jax.random.uniform(key, (2, 3, 32, 32), minval=-1, maxval=1)
    assert float(fn(x, x)) < 1e-6


def test_lpips_orders_distortions(key):
    fn = make_lpips_fn(key)
    x = jax.random.uniform(key, (1, 3, 64, 64), minval=-1, maxval=1)
    small = x + 0.05 * jax.random.normal(key, x.shape)
    large = x + 0.8 * jax.random.normal(key, x.shape)
    assert float(fn(x, small)) < float(fn(x, large))


def test_lpips_accepts_5d(key):
    fn = make_lpips_fn(key)
    x = jax.random.uniform(key, (1, 2, 3, 32, 32), minval=-1, maxval=1)
    v = fn(x, x * 0.9)
    assert np.isfinite(float(v))


def test_lpips_differentiable(key):
    fn = make_lpips_fn(key)
    x = jax.random.uniform(key, (1, 3, 32, 32), minval=-1, maxval=1)
    g = jax.grad(lambda a: fn(a, jnp.zeros_like(a)))(x)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_depth_anything_shapes(key):
    fn = make_depth_fn(key)
    imgs = jax.random.uniform(key, (1, 2, 3, 64, 64), minval=-1, maxval=1)
    disp = fn(imgs)
    assert disp.shape == (1, 2, 1, 64, 64)
    assert float(disp.min()) >= 0.0 and float(disp.max()) <= 1.0
    assert bool(jnp.isfinite(disp).all())


def test_depth_anything_nonsquare_and_pad(key):
    # 60x44: not multiples of 14; exercises pad + crop
    model = DepthAnythingV2()
    params = model.init(key, jnp.zeros((1, 3, 56, 56)))
    out = model.apply(params, jax.random.normal(key, (1, 3, 60, 44)))
    assert out.shape == (1, 1, 60, 44)
