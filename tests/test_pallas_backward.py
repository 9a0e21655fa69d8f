"""Pallas backward kernel vs XLA-autodiff gradients (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.ops.gaussian import composite_tiled, project_gaussians
from prometheus_tpu.ops.gaussian.pallas_backward import (
    composite_tiled_pallas_grad,
)


def project_scene(rng, h=32, w=32, f=30.0, n=80, scale=0.08):
    xyz = np.concatenate([
        rng.uniform(-1, 1, size=(n, 2)),
        rng.uniform(2.0, 6.0, size=(n, 1)),
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.3, 1.0, size=(n, 3)).astype(np.float32) * scale
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)
    proj = project_gaussians(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.eye(4), f, f, w / 2, h / 2, h, w)
    return proj, jnp.asarray(colors), jnp.asarray(opac)


def test_pallas_vjp_matches_xla_grads(rng):
    h = w = 32
    proj, colors, opac = project_scene(rng)
    g_rgb = jnp.asarray(rng.normal(size=(h, w, 3)), jnp.float32)
    g_dep = jnp.asarray(rng.normal(size=(h, w)), jnp.float32) * 0.1
    g_a = jnp.asarray(rng.normal(size=(h, w)), jnp.float32) * 0.1

    def loss_xla(mean2d, conic, depth, colors, opac):
        from prometheus_tpu.ops.gaussian.projection import Projected

        p = Projected(mean2d, conic, depth, proj.radius, proj.valid)
        rgb, dep, a = composite_tiled(p, colors, opac, h, w, tile_size=16,
                                      tile_capacity=128, chunk=128)
        return jnp.sum(rgb * g_rgb) + jnp.sum(dep * a * 0 + dep * g_dep * (a > 1e-6)) \
            + jnp.sum(a * g_a)

    def loss_pallas(mean2d, conic, depth, colors, opac):
        from prometheus_tpu.ops.gaussian.projection import Projected

        p = Projected(mean2d, conic, depth, proj.radius, proj.valid)
        rgb, dep, a = composite_tiled_pallas_grad(
            p, colors, opac, h, w, tile_size=16, capacity=128,
            interpret=True)
        return jnp.sum(rgb * g_rgb) + jnp.sum(dep * g_dep * (a > 1e-6)) \
            + jnp.sum(a * g_a)

    args = (proj.mean2d, proj.conic, proj.depth, colors, opac)
    # forward parity first
    np.testing.assert_allclose(float(loss_pallas(*args)),
                               float(loss_xla(*args)), rtol=1e-4)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["mean2d", "conic", "depth", "colors", "opacity"]
    for nm, a, b in zip(names, gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a, b, atol=2e-3 * denom + 1e-6,
                                   err_msg=nm)


def test_pallas_vjp_finite_differences(rng):
    h = w = 16
    xyz = jnp.asarray([[0.0, 0.0, 3.0], [0.2, -0.1, 4.0]])
    scales = jnp.full((2, 3), 0.3)
    quats = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    colors = jnp.asarray([[0.8, 0.2, 0.4], [0.1, 0.9, 0.5]])

    def loss(op):
        proj = project_gaussians(xyz, scales, quats, jnp.eye(4), 15.0, 15.0,
                                 8.0, 8.0, h, w)
        rgb, _, _ = composite_tiled_pallas_grad(
            proj, colors, op, h, w, tile_size=16, capacity=128,
            interpret=True)
        return jnp.sum(rgb**2)

    op0 = jnp.asarray([0.6, 0.4])
    g = jax.grad(loss)(op0)
    eps = 1e-3
    for i in range(2):
        fd = (loss(op0.at[i].add(eps)) - loss(op0.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=3e-2)
