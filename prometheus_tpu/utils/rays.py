"""Per-pixel ray generation and Plücker ray embedding (pure JAX, jit-safe).

Parity targets (see SURVEY.md §2.3):
- ``sample_rays``  ~ reference ``prometheus/utils/__init__.py:139-210``
- ``embed_rays``   ~ reference ``prometheus/utils/__init__.py:212-215``

Camera frame is OpenGL: pixel ``(x + 0.5, y + 0.5)`` maps to the camera-space
direction ``((x + 0.5 - cx)/fx, -(y + 0.5 - cy)/fy, -1)``, rotated to world by
``c2w[:3, :3]``. Unlike the reference we take static ``(h, w)`` arguments only
(XLA needs static shapes); full-resolution rays are the default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cameras import camera_c2w, camera_intrinsics


def _pixel_dirs(fx, fy, cx, cy, h: int, w: int, uv_offset=None):
    """Camera-space unnormalized ray directions on the (h, w) pixel grid.

    fx/fy/cx/cy: (...,) scalars per camera. Returns (..., h*w, 3).
    """
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    xs = xs.reshape(-1)  # (h*w,) pixel centers, x = column
    ys = ys.reshape(-1)
    x = (xs - cx[..., None]) / fx[..., None]
    y = -(ys - cy[..., None]) / fy[..., None]
    if uv_offset is not None:
        # uv_offset in the reference converter is expressed in units of
        # (pixel / c): u = x_pix/cx + du  =>  extra camera-space offset
        # du * cx / fx on the x axis (gaussians_renderer.py:240-250).
        x = x + uv_offset[..., 0] * cx[..., None] / fx[..., None]
        y = y - uv_offset[..., 1] * cy[..., None] / fy[..., None]
    z = -jnp.ones_like(x)
    return jnp.stack([x, y, z], axis=-1)


def sample_rays(cameras: jax.Array, h: int, w: int, *, uv_offset=None,
                normalize: bool = True):
    """Full-grid per-pixel rays for ``(..., 18)`` cameras.

    Returns ``(rays_o, rays_d)`` with shape ``(..., h*w, 3)``; ``rays_d`` is
    L2-normalized (matching the reference, so "depth" along rays is Euclidean
    distance, not z-depth).
    """
    c2w = camera_c2w(cameras)
    fx, fy, cx, cy, _, _ = camera_intrinsics(cameras, h=h, w=w)
    dirs = _pixel_dirs(fx, fy, cx, cy, h, w, uv_offset=uv_offset)
    rays_d = jnp.einsum("...ij,...nj->...ni", c2w[..., :3, :3], dirs,
                        precision=jax.lax.Precision.HIGHEST)
    if normalize:
        rays_d = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-8
        )
    rays_o = jnp.broadcast_to(c2w[..., None, :3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_rays_at(cameras: jax.Array, inds: jax.Array, h: int, w: int,
                   normalize: bool = True):
    """Rays at flat pixel indices ``inds`` ``(..., N)`` (random/patch sampling)."""
    c2w = camera_c2w(cameras)
    fx, fy, cx, cy, _, _ = camera_intrinsics(cameras, h=h, w=w)
    xs = (inds % w).astype(jnp.float32) + 0.5
    ys = (inds // w).astype(jnp.float32) + 0.5
    x = (xs - cx[..., None]) / fx[..., None]
    y = -(ys - cy[..., None]) / fy[..., None]
    dirs = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    rays_d = jnp.einsum("...ij,...nj->...ni", c2w[..., :3, :3], dirs,
                        precision=jax.lax.Precision.HIGHEST)
    if normalize:
        rays_d = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-8
        )
    rays_o = jnp.broadcast_to(c2w[..., None, :3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_patch_indices(key: jax.Array, batch: int, n: int, p: int,
                         h: int, w: int) -> jax.Array:
    """Random dilated-patch pixel indices, ``(batch, n)`` with ``n % p**2 == 0``.

    Mirrors the reference's patch sampler (multiplier-dilated PxP grids at a
    random offset) used for patchwise rendering losses.
    """
    assert n % (p * p) == 0
    num_patch = n // (p * p)
    short = min(h, w)
    kmul, ki, kj = jax.random.split(key, 3)
    mult = jax.random.randint(kmul, (batch * num_patch,), 1, short // p + 1)
    off_i = jnp.floor(
        jax.random.uniform(ki, (batch * num_patch,)) * (h - p * mult + mult)
    ).astype(jnp.int32)
    off_j = jnp.floor(
        jax.random.uniform(kj, (batch * num_patch,)) * (w - p * mult + mult)
    ).astype(jnp.int32)
    ar = jnp.arange(p)
    ii = ar[None, :] * mult[:, None] + off_i[:, None]  # rows
    jj = ar[None, :] * mult[:, None] + off_j[:, None]  # cols
    inds = ii[:, :, None] * w + jj[:, None, :]
    return inds.reshape(batch, n)


def embed_rays(rays_o: jax.Array, rays_d: jax.Array) -> jax.Array:
    """Plücker embedding ``[d, o × d]`` -> ``(..., 6)``."""
    return jnp.concatenate([rays_d, jnp.cross(rays_o, rays_d)], axis=-1)


def raymap(cameras: jax.Array, h: int, w: int) -> jax.Array:
    """Plücker raymap image ``(..., 6, h, w)`` (channels-first, conditioning)."""
    rays_o, rays_d = sample_rays(cameras, h, w)
    emb = embed_rays(rays_o, rays_d)  # (..., h*w, 6)
    batch = emb.shape[:-2]
    return jnp.moveaxis(emb.reshape(batch + (h, w, 6)), -1, -3)
