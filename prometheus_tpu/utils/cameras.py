"""Camera math: the 18-dim camera-vector data contract + pose utilities.

Data contract (parity with the reference; see SURVEY.md §3.0):
a camera is an 18-dim float vector per view,

    ``[c2w.flatten()(12), fx, fy, cx, cy, H, W]``

with the 3x4 camera-to-world pose flattened row-major and intrinsics in
pixels at the native resolution ``(H, W)``. Poses use the OpenGL convention
(+x right, +y up, camera looks down -z). First-camera-normalized with the max
input-view translation scaled to ~1
(reference: ``/root/reference/prometheus/datasets/base_dataset.py:587-603``).

Note on an intrinsics-axis quirk: the reference rescales ``fx, cx`` by
``h/H`` and ``fy, cy`` by ``w/W`` (``utils/__init__.py:154-161``) while using
``fx`` with the *column* coordinate — self-consistent only for square images
(every published config is square). We pair ``(fx, cx)`` with x/width and
``(fy, cy)`` with y/height, which is identical on square images and correct
otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .quaternion import (
    matrix_to_quaternion,
    quaternion_normalize,
    quaternion_slerp,
    quaternion_to_matrix,
)

CAMERA_DIM = 18


# ---------------------------------------------------------------------------
# Camera vector (18-dim) codec
# ---------------------------------------------------------------------------

def make_camera(c2w: jax.Array, fx, fy, cx, cy, h, w) -> jax.Array:
    """Assemble ``(..., 18)`` camera vectors from ``(..., 3, 4)`` poses."""
    c2w = jnp.asarray(c2w)
    batch = c2w.shape[:-2]
    intr = jnp.broadcast_to(
        jnp.stack([jnp.asarray(v, jnp.float32) for v in (fx, fy, cx, cy, h, w)], -1),
        batch + (6,),
    )
    return jnp.concatenate([c2w.reshape(batch + (12,)), intr], axis=-1)


def camera_c2w(cameras: jax.Array) -> jax.Array:
    """Extract ``(..., 4, 4)`` homogeneous camera-to-world poses."""
    batch = cameras.shape[:-1]
    c2w34 = cameras[..., :12].reshape(batch + (3, 4))
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], cameras.dtype), batch + (1, 4)
    )
    return jnp.concatenate([c2w34, bottom], axis=-2)


def camera_intrinsics(cameras: jax.Array, h=None, w=None):
    """Return ``(fx, fy, cx, cy, H, W)``, optionally rescaled to ``(h, w)``.

    Each returned entry has shape ``cameras.shape[:-1]``.
    """
    fx, fy, cx, cy, H, W = [cameras[..., 12 + i] for i in range(6)]
    if h is not None:
        fy, cy = fy * h / H, cy * h / H
        H = jnp.full_like(H, h)
    if w is not None:
        fx, cx = fx * w / W, cx * w / W
        W = jnp.full_like(W, w)
    return fx, fy, cx, cy, H, W


def camera_fov(cameras: jax.Array, h=None, w=None):
    """Per-camera ``(fovx, fovy)`` in radians at render resolution."""
    fx, fy, cx, cy, H, W = camera_intrinsics(cameras, h=h, w=w)
    fovx = 2.0 * jnp.arctan(0.5 * W / fx)
    fovy = 2.0 * jnp.arctan(0.5 * H / fy)
    return fovx, fovy


# ---------------------------------------------------------------------------
# Convention conversion (array-convention helpers; numpy or jax arrays)
# ---------------------------------------------------------------------------

def opencv_to_opengl(poses):
    """Negate the y and z columns of ``(..., 3, 4)`` poses (involution)."""
    xp = jnp if isinstance(poses, jax.Array) else np
    flip = xp.asarray([1.0, -1.0, -1.0, 1.0])
    return poses * flip[..., None, :]


opengl_to_opencv = opencv_to_opengl


def llff_to_opengl(poses):
    """LLFF (x-down-right? [down, right, backward]) -> OpenGL column swap."""
    xp = jnp if isinstance(poses, jax.Array) else np
    return xp.concatenate(
        [poses[..., 1:2], -poses[..., 0:1], poses[..., 2:3], poses[..., 3:4]], axis=-1
    )


def matrix_to_square(m):
    """Promote ``(..., 3, 4)`` to homogeneous ``(..., 4, 4)``."""
    xp = jnp if isinstance(m, jax.Array) else np
    batch = m.shape[:-2]
    bottom = xp.broadcast_to(xp.asarray([0.0, 0.0, 0.0, 1.0], m.dtype), batch + (1, 4))
    return xp.concatenate([m, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Pose normalization (data-pipeline contract)
# ---------------------------------------------------------------------------

def normalize_poses(c2ws: jax.Array, num_input_views: int = -1, eps: float = 1e-2):
    """First-frame-relative pose normalization with max-translation scaling.

    ``c2ws``: ``(N, 3, 4)`` OpenGL poses. All poses are premultiplied by the
    inverse of the first pose, then translations are divided by
    ``max_n |t_n| + eps`` over the first ``num_input_views`` views (all views
    if -1). Returns ``(normalized_c2ws (N,3,4), t_norm scalar)``; callers use
    ``t_norm`` against a scene-scale threshold.
    """
    sq = matrix_to_square(c2ws)
    ref_w2c = jnp.linalg.inv(sq[:1])
    # Pose chains are precision-critical: force fp32 MXU accumulation (the
    # platform default matmul precision is bf16-class).
    rel = jnp.einsum("rij,njk->nik", ref_w2c, sq,
                     precision=jax.lax.Precision.HIGHEST)[:, :3, :]
    nv = num_input_views if num_input_views > 0 else c2ws.shape[0]
    t_norm = jnp.linalg.norm(rel[:nv, :3, 3], axis=-1).max()
    t = rel[:, :3, 3] / (t_norm + eps)
    return jnp.concatenate([rel[:, :3, :3], t[..., None]], axis=-1), t_norm


def check_valid_rotations(rots: jax.Array, tol: float = 1e-5) -> jax.Array:
    """True iff every ``(..., 3, 3)`` block is a proper rotation (orthonormal, det 1)."""
    eye = jnp.eye(3, dtype=rots.dtype)
    orth = jnp.abs(
        jnp.einsum("...ij,...kj->...ik", rots, rots,
                   precision=jax.lax.Precision.HIGHEST) - eye
    ).max()
    det = jnp.abs(jnp.linalg.det(rots) - 1.0).max()
    return (orth < tol * 100) & (det < tol * 100)


# ---------------------------------------------------------------------------
# Trajectory interpolation (orbit-video export path)
# ---------------------------------------------------------------------------

def sample_from_two_poses(pose_a: jax.Array, pose_b: jax.Array, frac: jax.Array,
                          key: jax.Array | None = None,
                          noise_strengths=(0.0, 0.0)) -> jax.Array:
    """Slerp rotation + lerp translation between two ``(..., 3, 4)`` poses."""
    qa = matrix_to_quaternion(pose_a[..., :3, :3])
    qb = matrix_to_quaternion(pose_b[..., :3, :3])
    q = quaternion_slerp(qa, qb, frac)
    t = (1.0 - frac)[..., None] * pose_a[..., :3, 3] + frac[..., None] * pose_b[..., :3, 3]
    if key is not None and (noise_strengths[0] > 0 or noise_strengths[1] > 0):
        kq, kt = jax.random.split(key)
        q = quaternion_normalize(q + noise_strengths[0] * jax.random.normal(kq, q.shape))
        t = t + noise_strengths[1] * jax.random.normal(kt, t.shape)
    r = quaternion_to_matrix(q)
    return jnp.concatenate([r, t[..., None]], axis=-1)


def sample_from_dense_cameras(dense_cameras: jax.Array, t: jax.Array,
                              key: jax.Array | None = None,
                              noise_strengths=(0.0, 0.0, 0.0, 0.0)) -> jax.Array:
    """Resample an 18-dim camera trajectory at continuous positions.

    ``dense_cameras``: ``(B, N, 18)``; ``t``: ``(B, M)`` in [0, 1]. Pose part
    is slerp-interpolated, intrinsics lerp'd. Returns ``(B, M, 18)``.
    Parity: ``/root/reference/prometheus/utils/__init__.py:120-136``.
    """
    B, N, C = dense_cameras.shape
    left = jnp.clip(jnp.floor(t * (N - 1)).astype(jnp.int32), 0, N - 2)
    frac = t * (N - 1) - left
    a = jnp.take_along_axis(dense_cameras, left[..., None], axis=1)
    b = jnp.take_along_axis(dense_cameras, (left + 1)[..., None], axis=1)
    M = t.shape[1]
    pose = sample_from_two_poses(
        a[..., :12].reshape(B, M, 3, 4), b[..., :12].reshape(B, M, 3, 4), frac,
        key=key, noise_strengths=noise_strengths[:2],
    )
    intr = (1.0 - frac)[..., None] * a[..., 12:] + frac[..., None] * b[..., 12:]
    return jnp.concatenate([pose.reshape(B, M, 12), intr], axis=-1)


def get_random_cameras(key: jax.Array, n: int, *, radius_range=(1.5, 2.5),
                       elev_range=(-30.0, 30.0), fov=60.0, size=256) -> jax.Array:
    """Random look-at-origin orbit cameras (OpenGL), as ``(n, 18)`` vectors.

    Used by the T2I single-view path's dummy cameras and test fixtures
    (functional analog of ``utils/__init__.py:242-277``).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    radius = jax.random.uniform(k1, (n,), minval=radius_range[0], maxval=radius_range[1])
    elev = jnp.deg2rad(jax.random.uniform(k2, (n,), minval=elev_range[0], maxval=elev_range[1]))
    azim = jax.random.uniform(k3, (n,), minval=0.0, maxval=2 * jnp.pi)
    eye = jnp.stack([
        radius * jnp.cos(elev) * jnp.cos(azim),
        radius * jnp.sin(elev),
        radius * jnp.cos(elev) * jnp.sin(azim),
    ], -1)
    c2w = look_at(eye, jnp.zeros_like(eye))
    f = 0.5 * size / jnp.tan(jnp.deg2rad(fov) / 2)
    return make_camera(c2w, f, f, size / 2.0, size / 2.0, float(size), float(size))


def look_at(eye: jax.Array, target: jax.Array,
            up=(0.0, 1.0, 0.0)) -> jax.Array:
    """OpenGL look-at: camera z points *away* from the target. ``(..., 3, 4)``."""
    up = jnp.broadcast_to(jnp.asarray(up, eye.dtype), eye.shape)
    z = eye - target
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    x = jnp.cross(up, z)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z, eye], axis=-1)
