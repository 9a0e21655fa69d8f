"""GaussianConverter: per-pixel decoder output -> world-space 3D Gaussians.

Functional JAX port of the reference converter semantics
(``/root/reference/prometheus/modules/renderers/gaussians_renderer.py:173-287``):
the 14 decoder channels per pixel are split as ``[features 3, uv_offset 2,
depth 1, opacity 1, scales 3, rotations 4]``, activated per mode, and
unprojected along per-pixel (uv-offset-adjusted, L2-normalized) camera rays:
``xyz = rays_o + depth * rays_d``.

Modes:
- ``mvsplat`` (default): sigmoid depth lerped into [z_near, z_far], sigmoid
  scales lerped into [s_min, s_max], sigmoid color/opacity.
- ``gslrm``: sigmoid depth lerp, ``exp(s - 2.3)`` scales clipped to 0.3,
  ``sigmoid(o - 2)`` opacity, raw colors.
- ``director3d``: pre-scaled params, ``depth + 1.85``, exp/sigmoid with offsets.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...utils.rays import sample_rays

GAUSSIAN_CHANNELS = (3, 2, 1, 1, 3, 4)  # features, uv, depth, opacity, scales, rots
NUM_GAUSSIAN_CHANNELS = sum(GAUSSIAN_CHANNELS)

# director3d-mode constants (per-channel pre-multipliers, normalized by max)
_D3D_MULS = jnp.asarray(
    [0.01] * 3 + [0.01] * 2 + [0.05] + [0.05] + [0.005] * 3 + [0.005] * 4
) / 0.05
_D3D_OPACITY_OFFSET = jnp.log(0.01 / 0.99)  # inverse_sigmoid(0.01)
_D3D_SCALES_OFFSET = jnp.log(1.0 / 100.0)
_SH_C0 = 0.28209479177387814


@partial(jax.jit, static_argnames=("mode",))
def convert_gaussians(
    local_params: jax.Array,  # (B, N, 14, h, w) raw decoder output
    cameras: jax.Array,       # (B, N, 18)
    mode: str = "mvsplat",
    z_near: float = 0.001,
    z_far: float = 100.0,
    s_min: float = 0.001,
    s_max: float = 1.0,
):
    """Returns the gaussian tuple ``(xyz (B,Npts,3), features (B,Npts,1,3),
    opacity (B,Npts,1), scales (B,Npts,3), rotations (B,Npts,4))`` with
    ``Npts = N * h * w`` and activations applied."""
    B, N, C, h, w = local_params.shape
    assert C == NUM_GAUSSIAN_CHANNELS
    params = jnp.moveaxis(local_params, 2, -1).astype(jnp.float32)  # (B,N,h,w,14)
    if mode == "director3d":
        params = params * _D3D_MULS
    params = params.reshape(B, N, h * w, C)

    import numpy as _np

    splits = list(_np.cumsum(GAUSSIAN_CHANNELS)[:-1])
    feats, uv, depth, opacity, scales, rots = jnp.split(params, splits, axis=-1)

    rays_o, rays_d = sample_rays(cameras, h, w, uv_offset=uv)

    if mode == "mvsplat":
        d_ = jax.nn.sigmoid(depth)
        depth = z_near * (1 - d_) + z_far * d_
        s_ = jax.nn.sigmoid(scales)
        scales = s_min * (1 - s_) + s_max * s_
        feats = jax.nn.sigmoid(feats)
        opacity = jax.nn.sigmoid(opacity)
    elif mode == "gslrm":
        d_ = jax.nn.sigmoid(depth)
        depth = z_near * (1 - d_) + z_far * d_
        opacity = jax.nn.sigmoid(opacity - 2.0)
        scales = jnp.clip(jnp.exp(scales - 2.3), 0.0, 0.3)
    elif mode == "director3d":
        depth = depth + 1.85
        feats = feats / (2 * _SH_C0)
        opacity = jax.nn.sigmoid(opacity + _D3D_OPACITY_OFFSET)
        scales = jnp.exp(scales + _D3D_SCALES_OFFSET)
        rots = rots + jnp.asarray([1.0, 0.0, 0.0, 0.0])
    else:
        raise ValueError(f"unsupported gs_convert_mode: {mode}")

    rots = rots / jnp.maximum(jnp.linalg.norm(rots, axis=-1, keepdims=True), 1e-8)
    xyz = rays_o + depth * rays_d

    npts = N * h * w
    return (
        xyz.reshape(B, npts, 3),
        feats.reshape(B, npts, 1, 3),
        opacity.reshape(B, npts, 1),
        scales.reshape(B, npts, 3),
        rots.reshape(B, npts, 4),
    )
