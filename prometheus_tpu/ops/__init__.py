"""Compute kernels: 3DGS rasterization, attention, diffusion schedulers."""
