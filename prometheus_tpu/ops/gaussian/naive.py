"""Naive (exact) per-pixel 3DGS compositing — the golden reference renderer.

O(H*W*N): every pixel evaluates every depth-sorted gaussian. Used only in
tests and tiny-scene validation of the production tiled/Pallas paths
(SURVEY.md §4 test strategy). Semantics match gsplat's ``RGB+ED`` render mode:
alpha-composited RGB, expected depth (accumulated depth / alpha), and alpha.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import Projected

ALPHA_CUTOFF = 1.0 / 255.0
MAX_ALPHA = 0.999


def composite_naive(
    proj: Projected,
    colors: jax.Array,     # (N, 3) in [0, 1]
    opacities: jax.Array,  # (N,)
    img_h: int,
    img_w: int,
    tile_size: int | None = None,
):
    """Exact front-to-back compositing over all gaussians.

    ``tile_size``: if given, a gaussian contributes to a pixel only when the
    pixel's tile intersects the gaussian's bounding box — the same culling
    rule as the tiled production path, so outputs are bit-comparable.

    Returns ``(rgb (H,W,3), depth (H,W), alpha (H,W))`` — rgb WITHOUT
    background blend (callers blend).
    """
    order = jnp.argsort(proj.depth)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    depth = proj.depth[order]
    radius = proj.radius[order]
    valid = proj.valid[order]
    colors = colors[order]
    opacities = opacities[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(img_h, dtype=jnp.float32) + 0.5,
        jnp.arange(img_w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    px = jnp.stack([xs, ys], -1).reshape(-1, 2)  # (P, 2)

    d = px[:, None, :] - mean2d[None, :, :]      # (P, N, 2)
    sigma = 0.5 * (
        conic[None, :, 0] * d[..., 0] ** 2 + conic[None, :, 2] * d[..., 1] ** 2
    ) + conic[None, :, 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(MAX_ALPHA, opacities[None, :] * jnp.exp(-sigma))
    keep = valid[None, :] & (alpha >= ALPHA_CUTOFF) & (sigma >= 0)

    if tile_size is not None:
        # Same tile-level culling as the production path.
        tx = (px[:, 0] - 0.5) // tile_size
        ty = (px[:, 1] - 0.5) // tile_size
        gx0 = jnp.floor((mean2d[:, 0] - radius) / tile_size)
        gx1 = jnp.floor((mean2d[:, 0] + radius) / tile_size)
        gy0 = jnp.floor((mean2d[:, 1] - radius) / tile_size)
        gy1 = jnp.floor((mean2d[:, 1] + radius) / tile_size)
        keep &= (
            (tx[:, None] >= gx0[None, :]) & (tx[:, None] <= gx1[None, :])
            & (ty[:, None] >= gy0[None, :]) & (ty[:, None] <= gy1[None, :])
        )

    alpha = jnp.where(keep, alpha, 0.0)
    # Transmittance BEFORE each gaussian: exclusive cumprod of (1 - alpha),
    # computed by shifting (dividing by (1 - alpha) is unstable as alpha -> 1).
    one_m = 1.0 - alpha
    trans = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), jnp.cumprod(one_m[:, :-1], axis=1)], axis=1
    )
    w = alpha * trans                            # (P, N)
    hi = jax.lax.Precision.HIGHEST  # accumulate in fp32, not platform bf16
    rgb = jnp.einsum("pn,nc->pc", w, colors, precision=hi)
    depth_safe = jnp.where(jnp.isfinite(depth), depth, 0.0)
    acc_depth = jnp.einsum("pn,nc->pc", w, depth_safe[:, None], precision=hi)
    acc_alpha = w.sum(-1, keepdims=True)
    exp_depth = acc_depth / jnp.maximum(acc_alpha, 1e-10)
    return (
        rgb.reshape(img_h, img_w, 3),
        exp_depth.reshape(img_h, img_w),
        acc_alpha.reshape(img_h, img_w),
    )
