"""Differentiable 3D Gaussian Splatting for TPU (projection, binning, compositing).

The from-scratch replacement for the reference's external CUDA rasterizers
(gsplat / diff-gaussian-rasterization). Public API:

- :func:`render_gaussians` — batched (B, N)-view RGB + expected-depth + alpha
- :func:`convert_gaussians` — decoder channels -> world-space gaussian tuple
- :func:`project_gaussians` / :func:`composite_tiled` — the two pipeline stages
- :func:`composite_naive` — exact O(HW*N) golden reference for tests
"""
from .converter import GAUSSIAN_CHANNELS, NUM_GAUSSIAN_CHANNELS, convert_gaussians
from .naive import composite_naive
from .projection import Projected, covariance_3d, project_gaussians, w2c_from_camera_vector
from .renderer import render_gaussians, render_gaussians_tile_sharded
from .tiled import composite_tiled

__all__ = [
    "GAUSSIAN_CHANNELS",
    "NUM_GAUSSIAN_CHANNELS",
    "Projected",
    "composite_naive",
    "composite_tiled",
    "convert_gaussians",
    "covariance_3d",
    "project_gaussians",
    "render_gaussians",
    "render_gaussians_tile_sharded",
    "w2c_from_camera_vector",
]
