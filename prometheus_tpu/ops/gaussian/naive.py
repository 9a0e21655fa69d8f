"""Naive (exact) per-pixel 3DGS compositing — the golden reference renderer.

O(H*W*N): every pixel evaluates every depth-sorted gaussian. Used only in
tests and tiny-scene validation of the production tiled/Pallas paths
(SURVEY.md §4 test strategy). Semantics match gsplat's ``RGB+ED`` render mode:
alpha-composited RGB, expected depth (accumulated depth / alpha), and alpha.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import ALPHA_CUTOFF, MAX_ALPHA, Projected  # noqa: F401
# (cutoffs live in projection.py so the opacity-aware radius shares them)


def composite_exact_pixels(
    proj: Projected,
    colors: jax.Array,     # (N, 3) in [0, 1]
    opacities: jax.Array,  # (N,)
    px: jax.Array,         # (P, 2) pixel centers (x+0.5, y+0.5)
    chunk: int = 4096,
):
    """EXACT front-to-back compositing at arbitrary pixel centers with
    O(P * chunk) memory: a ``lax.scan`` over depth-sorted gaussian chunks
    carries per-pixel transmittance, so production density (10^5..10^6
    gaussians) is tractable where the dense (P, N) pairwise form is not.

    This is the ground truth the production tiled/Pallas paths are measured
    against at 512^2/524k (VERDICT round-2 weak #1: no tile culling, no
    capacity truncation, no big-splat budget — pure compositing math).

    Returns ``(rgb (P,3), expected_depth (P,), alpha (P,))`` — rgb WITHOUT
    background blend.
    """
    n = proj.mean2d.shape[0]
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    pad = (-n) % chunk
    valid = jnp.concatenate([proj.valid[order],
                             jnp.zeros((pad,), jnp.bool_)])

    def take(a, fill=0.0):
        a_s = a[order]
        if pad:
            a_s = jnp.concatenate(
                [a_s, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
        return a_s

    mean2d = take(proj.mean2d)
    conic = take(proj.conic)
    d_sorted = take(proj.depth)
    depth = jnp.where(jnp.isfinite(d_sorted), d_sorted, 0.0)
    cols = take(colors)
    opac = take(opacities)

    n_chunks = (n + pad) // chunk
    P = px.shape[0]

    def step(carry, c):
        rgb, dep, trans = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk)
        m2, con, dpt = sl(mean2d), sl(conic), sl(depth)
        cl, op, vd = sl(cols), sl(opac), sl(valid)
        d = px[:, None, :] - m2[None, :, :]                 # (P, C, 2)
        sigma = 0.5 * (con[None, :, 0] * d[..., 0] ** 2
                       + con[None, :, 2] * d[..., 1] ** 2) \
            + con[None, :, 1] * d[..., 0] * d[..., 1]
        alpha = jnp.minimum(MAX_ALPHA, op[None, :] * jnp.exp(-sigma))
        alpha = jnp.where(vd[None, :] & (alpha >= ALPHA_CUTOFF)
                          & (sigma >= 0), alpha, 0.0)
        one_m = 1.0 - alpha
        t_in = jnp.concatenate(
            [jnp.ones_like(alpha[:, :1]),
             jnp.cumprod(one_m[:, :-1], axis=1)], axis=1)
        w = alpha * t_in * trans[:, None]
        hi = jax.lax.Precision.HIGHEST
        rgb = rgb + jnp.einsum("pc,cf->pf", w, cl, precision=hi)
        dep = dep + jnp.einsum("pc,c->p", w, dpt, precision=hi)
        trans = trans * t_in[:, -1] * one_m[:, -1]
        return (rgb, dep, trans), None

    init = (jnp.zeros((P, 3), jnp.float32), jnp.zeros((P,), jnp.float32),
            jnp.ones((P,), jnp.float32))
    (rgb, dep, trans), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks, dtype=jnp.int32))
    acc_alpha = 1.0 - trans
    exp_depth = dep / jnp.maximum(acc_alpha, 1e-10)
    return rgb, exp_depth, acc_alpha


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
        # Same tile-level culling as the production path (per-axis extents
        # when the projection provides them, isotropic radius otherwise).
        from .projection import bbox_extents

        rx, ry = bbox_extents(proj)
        rx, ry = rx[order], ry[order]
        tx = (px[:, 0] - 0.5) // tile_size
        ty = (px[:, 1] - 0.5) // tile_size
        gx0 = jnp.floor((mean2d[:, 0] - rx) / tile_size)
        gx1 = jnp.floor((mean2d[:, 0] + rx) / tile_size)
        gy0 = jnp.floor((mean2d[:, 1] - ry) / tile_size)
        gy1 = jnp.floor((mean2d[:, 1] + ry) / tile_size)
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
