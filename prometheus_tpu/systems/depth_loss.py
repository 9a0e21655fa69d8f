"""Scale-and-shift-invariant (MiDaS-style) depth loss + disparity helpers.

Parity target: ``/root/reference/prometheus/systems/depth_loss.py``. The
per-image optimal affine alignment ``(scale, shift)`` between prediction and
target is solved in closed form from the 2x2 normal equations under a mask;
the data term is masked MSE of the aligned prediction, plus a multi-scale
gradient-matching regularizer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_scale_and_shift(prediction: jax.Array, target: jax.Array,
                            mask: jax.Array):
    """Per-image lstsq solve of ``target ~ scale * prediction + shift``.

    All inputs ``(B, H, W)``; returns ``(scale (B,), shift (B,))``.
    """
    a00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a01 = jnp.sum(mask * prediction, axis=(1, 2))
    a11 = jnp.sum(mask, axis=(1, 2))
    b0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b1 = jnp.sum(mask * target, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    valid = det > 0
    det_safe = jnp.where(valid, det, 1.0)
    scale = jnp.where(valid, (a11 * b0 - a01 * b1) / det_safe, 0.0)
    shift = jnp.where(valid, (-a01 * b0 + a00 * b1) / det_safe, 0.0)
    return scale, shift


def _reduction_batch_based(image_loss, m):
    divisor = jnp.sum(m)
    # double-where pattern: the untaken division branch must stay finite or
    # its NaN leaks through the gradient of jnp.where
    safe = jnp.maximum(divisor, 1e-6)
    return jnp.where(divisor > 0, jnp.sum(image_loss) / safe, 0.0)


def mse_loss(prediction, target, mask):
    res = prediction - target
    image_loss = jnp.sum(mask * res * res, axis=(1, 2))
    return _reduction_batch_based(image_loss, 2 * jnp.sum(mask, axis=(1, 2)))


def gradient_loss(prediction, target, mask):
    diff = mask * (prediction - target)
    grad_x = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1])
    mask_x = mask[:, :, 1:] * mask[:, :, :-1]
    grad_y = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :])
    mask_y = mask[:, 1:, :] * mask[:, :-1, :]
    image_loss = (jnp.sum(mask_x * grad_x, axis=(1, 2))
                  + jnp.sum(mask_y * grad_y, axis=(1, 2)))
    return _reduction_batch_based(image_loss, jnp.sum(mask, axis=(1, 2)))


def scale_and_shift_invariant_loss(prediction: jax.Array, target: jax.Array,
                                   mask: jax.Array | None = None,
                                   alpha: float = 0.5, scales: int = 4):
    """SSI loss over ``(B, H, W)`` disparities; multi-scale gradient term."""
    if mask is None:
        mask = jnp.ones_like(prediction)
    scale, shift = compute_scale_and_shift(prediction, target, mask)
    aligned = scale[:, None, None] * prediction + shift[:, None, None]
    total = mse_loss(aligned, target, mask)
    if alpha > 0:
        for s in range(scales):
            step = 2**s
            total = total + alpha * gradient_loss(
                aligned[:, ::step, ::step], target[:, ::step, ::step],
                mask[:, ::step, ::step])
    return total


def disp_to_depth(disp: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Normalized disparity in [0, 1] -> depth (reference quantile-free form)."""
    return 1.0 / jnp.maximum(disp, eps)


def depth_to_disp(depth: jax.Array, eps: float = 1e-4,
                  normalize: bool = True) -> jax.Array:
    disp = 1.0 / jnp.maximum(depth, eps)
    if normalize:
        lo = jnp.quantile(disp, 0.02)
        hi = jnp.quantile(disp, 0.98)
        disp = (disp - lo) / jnp.maximum(hi - lo, 1e-8)
        disp = jnp.clip(disp, 0.0, 1.0)
    return disp
