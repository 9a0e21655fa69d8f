"""Sharded rasterization: a single scene's views sharded over the mesh
(BASELINE config 5's 'sharded tile rasterization' on v5e-8 — each chip
renders its views; gaussians replicate)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from prometheus_tpu.ops.gaussian import render_gaussians
from prometheus_tpu.parallel import make_mesh
from prometheus_tpu.utils import get_random_cameras


def test_view_sharded_render(key):
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    N, Pn = n_dev, 256
    cams = get_random_cameras(key, N, size=64)[None]
    xyz = jax.random.uniform(key, (1, Pn, 3), minval=-1, maxval=1)
    xyz = xyz.at[..., 2].add(-3.0)
    gauss = (
        xyz,
        jax.random.uniform(key, (1, Pn, 1, 3)),
        jnp.full((1, Pn, 1), 0.8),
        jnp.full((1, Pn, 3), 0.05),
        jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, Pn, 1)),
    )
    ref = render_gaussians(cams, gauss, h=64, w=64, tile_capacity=256)

    cams_sharded = jax.device_put(cams, NamedSharding(mesh, P(None, "data")))
    gauss_repl = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), gauss)
    out = render_gaussians(cams_sharded, gauss_repl, h=64, w=64,
                           tile_capacity=256)
    # view outputs are sharded over the mesh and numerically identical
    assert len(out[0].sharding.device_set) == n_dev
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=1e-5)


def test_tile_sharded_render_matches_single_device(key):
    """render_gaussians_tile_sharded: each device composites a band of tile
    rows of ONE image; the assembled image equals the single-device render
    (single-image latency scaling — SURVEY §7 step 9)."""
    from prometheus_tpu.ops.gaussian import render_gaussians_tile_sharded

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    N, Pn = 2, 512
    h = w = 16 * n_dev * 2  # 2 tile rows per device
    cams = get_random_cameras(key, N, size=h)[None]
    k1, k2, k3 = jax.random.split(key, 3)
    xyz = jax.random.uniform(k1, (1, Pn, 3), minval=-1, maxval=1)
    xyz = xyz.at[..., 2].add(-3.0)
    gauss = (
        xyz,
        jax.random.uniform(k2, (1, Pn, 1, 3)),
        jax.random.uniform(k3, (1, Pn, 1), minval=0.2, maxval=0.95),
        jnp.full((1, Pn, 3), 0.07),
        jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, Pn, 1)),
    )
    ref = render_gaussians(cams, gauss, h=h, w=w, tile_capacity=256)
    out = render_gaussians_tile_sharded(mesh, cams, gauss, h=h, w=w,
                                        tile_capacity=256)
    assert len(out[0].sharding.device_set) == n_dev
    for o, r in zip(out, ref):  # images, depths, masks
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5)


def test_tile_sharded_render_rejects_bad_split(key):
    import pytest

    from prometheus_tpu.ops.gaussian import render_gaussians_tile_sharded

    mesh = make_mesh()
    cams = get_random_cameras(key, 1, size=48)[None]
    gauss = (jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, 1, 3)),
             jnp.zeros((1, 4, 1)), jnp.full((1, 4, 3), 0.05),
             jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, 4, 1)))
    with pytest.raises(ValueError):
        render_gaussians_tile_sharded(mesh, cams, gauss, h=48, w=48)
