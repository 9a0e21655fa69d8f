"""Quaternion / rotation utilities (pure JAX, fully batched and jit-safe).

Conventions: quaternions are ``(w, x, y, z)`` (real part first), matching the
reference's pytorch3d-derived helpers (see
``/root/reference/prometheus/modules/renderers/gaussians_renderer.py:40-136``).
Unlike the reference's per-element Python loop for matrix->quaternion, this
implementation is branchless (4-way select) so it vmaps/jits on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Convert ``(..., 4)`` quaternions (w,x,y,z) to ``(..., 3, 3)`` rotations.

    Handles un-normalized quaternions via the 2/|q|^2 scale factor, matching
    the reference semantics.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=-1), 1e-12)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Convert ``(..., 3, 3)`` rotation matrices to ``(..., 4)`` (w,x,y,z).

    Branchless Shepperd's method: compute the candidate quaternion from all
    four pivots and select the numerically best (largest pivot) per element.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four squared pivots (up to a factor of 4): 4w^2, 4x^2, 4y^2, 4z^2.
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # Candidate quaternions, one per pivot.
    sw = safe_sqrt(qw2)  # = 2w
    cand_w = jnp.stack([0.25 * sw * 2.0, (m21 - m12) / (2.0 * sw),
                        (m02 - m20) / (2.0 * sw), (m10 - m01) / (2.0 * sw)], -1)
    sx = safe_sqrt(qx2)  # = 2x
    cand_x = jnp.stack([(m21 - m12) / (2.0 * sx), 0.25 * sx * 2.0,
                        (m01 + m10) / (2.0 * sx), (m02 + m20) / (2.0 * sx)], -1)
    sy = safe_sqrt(qy2)  # = 2y
    cand_y = jnp.stack([(m02 - m20) / (2.0 * sy), (m01 + m10) / (2.0 * sy),
                        0.25 * sy * 2.0, (m12 + m21) / (2.0 * sy)], -1)
    sz = safe_sqrt(qz2)  # = 2z
    cand_z = jnp.stack([(m10 - m01) / (2.0 * sz), (m02 + m20) / (2.0 * sz),
                        (m12 + m21) / (2.0 * sz), 0.25 * sz * 2.0], -1)

    pivots = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], -2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quaternion_normalize(q)


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of two (w,x,y,z) quaternion arrays (broadcasting)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array,
                     eps: float = 1e-7) -> jax.Array:
    """Spherical linear interpolation between unit quaternions.

    ``t`` broadcasts against the batch dims of ``q0``/``q1``. Falls back to
    lerp when the quaternions are nearly (anti)parallel.
    """
    q0 = quaternion_normalize(q0)
    q1 = quaternion_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    # Take the short arc.
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - eps))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) < jnp.ndim(dot) else t
    use_lerp = dot > 1.0 - 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, eps))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, eps))
    return quaternion_normalize(w0 * q0 + w1 * q1)
