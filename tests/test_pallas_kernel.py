"""Pallas compositing kernel vs the XLA tiled path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.ops.gaussian import composite_tiled, project_gaussians
from prometheus_tpu.ops.gaussian.pallas_kernel import (
    bin_and_gather,
    composite_tiled_pallas,
)


def project_scene(rng, h=64, w=64, f=60.0, n=300, scale=0.05):
    xyz = np.concatenate([
        rng.uniform(-1, 1, size=(n, 2)),
        rng.uniform(2.0, 6.0, size=(n, 1)),
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32) * scale
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, size=(n,)).astype(np.float32)
    proj = project_gaussians(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.eye(4), f, f, w / 2, h / 2, h, w)
    return proj, jnp.asarray(colors), jnp.asarray(opac)


def test_bin_and_gather_layout(rng):
    h = w = 32
    proj, colors, opac = project_scene(rng, h=h, w=w, n=100)
    data, counts = bin_and_gather(proj, colors, opac, h, w, tile_size=16,
                                  capacity=128)
    assert data.shape == (4, 16, 128)
    assert counts.shape == (4,)
    assert int(counts.max()) <= 128
    # opacities of padded slots are zero
    assert bool(jnp.isfinite(data).all())


def test_pallas_matches_xla_tiled(rng):
    h = w = 64
    proj, colors, opac = project_scene(rng, h=h, w=w, n=300)
    rgb_x, dep_x, a_x = composite_tiled(
        proj, colors, opac, h, w, tile_size=16, tile_capacity=256, chunk=128,
        max_tiles_y=8, max_tiles_x=8)
    rgb_p, dep_p, a_p = composite_tiled_pallas(
        proj, colors, opac, h, w, tile_size=16, capacity=256,
        max_tiles=(8, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x), atol=1e-4)
    m = np.asarray(a_x) > 1e-3
    np.testing.assert_allclose(np.asarray(dep_p)[m], np.asarray(dep_x)[m],
                               atol=1e-2, rtol=1e-3)


def test_pallas_empty_tiles(rng):
    # scene confined to one corner: most tiles have empty worklists
    h = w = 64
    xyz = jnp.asarray([[-1.5, -1.5, 3.0]])
    proj = project_gaussians(
        xyz, jnp.full((1, 3), 0.05), jnp.asarray([[1.0, 0, 0, 0]]),
        jnp.eye(4), 60.0, 60.0, 32.0, 32.0, h, w)
    rgb, dep, a = composite_tiled_pallas(
        proj, jnp.asarray([[1.0, 0, 0]]), jnp.asarray([0.9]), h, w,
        capacity=128, interpret=True)
    assert bool(jnp.isfinite(rgb).all())
    assert float(a.max()) > 0.5       # the gaussian renders somewhere
    assert float(a[:16, 32:].max()) == 0.0  # far tiles empty
