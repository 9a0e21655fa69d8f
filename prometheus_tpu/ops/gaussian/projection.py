"""3D Gaussian -> screen-space projection (EWA splatting), pure JAX.

Replaces the projection stage of the reference's external CUDA rasterizer
(``gsplat.rasterization``, called from
``/root/reference/prometheus/modules/renderers/gaussians_renderer.py:413-427``)
with differentiable XLA ops. Math follows the 3DGS/EWA formulation:

    Sigma = R S S^T R^T                       (world-space covariance)
    t     = W p + c                           (camera space, +z forward)
    Sigma2D = J W Sigma W^T J^T + eps2d * I   (screen space, low-pass dilated)

Camera space here is OpenCV convention (x right, y down, z forward); the
renderer converts from the framework's OpenGL camera vectors before calling
in. All outputs are per-gaussian and fully batched; everything is
differentiable except the integer radius, which only gates tile binning.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils.quaternion import quaternion_to_matrix

# Screen-space low-pass filter added to the 2D covariance diagonal; the 3DGS
# convention ensures every splat covers >= ~1 pixel.
EPS2D = 0.3
# Mahalanobis cutoff used for the bounding radius (3 sigma).
RADIUS_CUTOFF = 3.0
# Compositing cutoffs (shared by every compositor; naive.py re-exports).
# Contributions with alpha below ALPHA_CUTOFF are zeroed, which makes an
# opacity-aware bounding radius EXACT: beyond r with op*exp(-r^2/2v) =
# ALPHA_CUTOFF a splat contributes exactly nothing.
ALPHA_CUTOFF = 1.0 / 255.0
MAX_ALPHA = 0.999


class Projected(NamedTuple):
    """Per-gaussian screen-space quantities (leading dims = gaussian batch)."""

    mean2d: jax.Array   # (..., 2) pixel coords
    conic: jax.Array    # (..., 3) inverse 2D covariance (a, b, c): quad = a dx^2 + 2b dxdy + c dy^2
    depth: jax.Array    # (...,) camera-space z
    radius: jax.Array   # (...,) float bounding radius in pixels (0 where culled)
    valid: jax.Array    # (...,) bool
    # Per-axis half-extents of the cutoff level set's EXACT axis-aligned
    # bounding box: the ellipse {d : sigma(d) <= q} spans +-sqrt(2q Sigma_xx)
    # horizontally and +-sqrt(2q Sigma_yy) vertically — always <= the
    # isotropic ``radius`` (= sqrt(2q lambda_max)), and strictly tighter for
    # anisotropic splats. Used by tile binning; ``None`` (hand-built test
    # projections) falls back to the isotropic radius.
    rx: jax.Array | None = None   # (...,) horizontal half-extent (pixels)
    ry: jax.Array | None = None   # (...,) vertical half-extent (pixels)


def bbox_extents(proj: "Projected") -> tuple[jax.Array, jax.Array]:
    """Per-axis bounding half-extents ``(rx, ry)`` with isotropic fallback."""
    rx = proj.radius if proj.rx is None else proj.rx
    ry = proj.radius if proj.ry is None else proj.ry
    return rx, ry


def covariance_3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """World-space covariance ``R diag(s^2) R^T`` -> ``(..., 3, 3)``."""
    R = quaternion_to_matrix(quats)
    # R * s^2 along columns, then times R^T
    m = R * (scales**2)[..., None, :]
    return jnp.einsum("...ij,...kj->...ik", m, R,
                      precision=jax.lax.Precision.HIGHEST)


def project_gaussians(
    means3d: jax.Array,   # (N, 3) world
    scales: jax.Array,    # (N, 3)
    quats: jax.Array,     # (N, 4) (w,x,y,z)
    w2c: jax.Array,       # (4, 4) world->camera (OpenCV), row-major action y = Rx + t
    fx, fy, cx, cy,
    img_h: int, img_w: int,
    near: float = 0.01,
    far: float = 1e10,
    eps2d: float = EPS2D,
    opacities: jax.Array | None = None,  # (N,) -> opacity-aware radius
) -> Projected:
    """Project gaussians into one camera. Returns screen-space params.

    With ``opacities`` given, the bounding radius solves
    ``op * exp(-r^2 / (2 * lambda_max)) = ALPHA_CUTOFF`` instead of the fixed
    3-sigma cutoff: transparent splats shrink (their 3-sigma skirt is below
    the cutoff every compositor applies, so nothing visible is lost), fully
    opaque ones grow slightly (to ~3.33 sigma, where their contribution
    truly falls under the cutoff), and splats with ``op <= ALPHA_CUTOFF``
    are culled outright. This keeps tile binning EXACT w.r.t. the cutoff
    semantics while cutting instance counts in the transparent-heavy
    regimes trained models produce. The radius only gates binning and is
    never differentiated; sub-cutoff splats already received zero gradient
    from the compositors' alpha cutoff, so culling them changes nothing.
    """
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    p_cam = means3d @ R.T + t  # (N, 3)
    tz = p_cam[..., 2]
    in_depth = (tz > near) & (tz < far)
    tz_safe = jnp.where(in_depth, tz, 1.0)

    # Clamp the tangent-plane coords used for the Jacobian (EWA stability for
    # gaussians near/behind the image border).
    lim_x = 1.3 * (0.5 * img_w / fx)
    lim_y = 1.3 * (0.5 * img_h / fy)
    txz = jnp.clip(p_cam[..., 0] / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(p_cam[..., 1] / tz_safe, -lim_y, lim_y)

    # Camera-space covariance M diag(s^2) M^T with M = R_w2c @ R_gauss,
    # expanded to elementwise VPU math: batched (3,3) einsums lower to MXU
    # matmuls at 3/128 tile utilization and dominated the projection stage.
    Rg = quaternion_to_matrix(quats)              # (N, 3, 3)
    s2 = scales**2
    M = [[R[i, 0] * Rg[..., 0, k] + R[i, 1] * Rg[..., 1, k]
          + R[i, 2] * Rg[..., 2, k] for k in range(3)] for i in range(3)]

    def _cc(i, j):
        return (s2[..., 0] * M[i][0] * M[j][0]
                + s2[..., 1] * M[i][1] * M[j][1]
                + s2[..., 2] * M[i][2] * M[j][2])

    # J = [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]
    inv_z = 1.0 / tz_safe
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z
    # cov2d = J cov_cam J^T, expanded (J has structure [[j00,0,j02],[0,j11,j12]])
    c00, c01, c02 = _cc(0, 0), _cc(0, 1), _cc(0, 2)
    c11, c12, c22 = _cc(1, 1), _cc(1, 2), _cc(2, 2)
    a00 = j00 * c00 + j02 * c02
    a01 = j00 * c01 + j02 * c12
    a02 = j00 * c02 + j02 * c22
    b11 = j11 * c11 + j12 * c12
    b12 = j11 * c12 + j12 * c22
    cov00 = a00 * j00 + a02 * j02 + eps2d
    cov01 = a01 * j11 + a02 * j12
    cov11 = b11 * j11 + b12 * j12 + eps2d

    det = cov00 * cov11 - cov01 * cov01
    valid = in_depth & (det > 0)
    det_safe = jnp.where(valid, det, 1.0)
    conic = jnp.stack([cov11 / det_safe, -cov01 / det_safe, cov00 / det_safe], -1)

    mean2d = jnp.stack(
        [fx * p_cam[..., 0] * inv_z + cx, fy * p_cam[..., 1] * inv_z + cy], -1
    )

    # Bounding radius from the largest eigenvalue of cov2d, plus the EXACT
    # per-axis AABB of the cutoff level set (rx/ry from the covariance
    # diagonal — the ellipse's axis-aligned extents; see Projected).
    b = 0.5 * (cov00 + cov11)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det, 0.01))
    if opacities is None:
        k = RADIUS_CUTOFF
    else:
        op = jax.lax.stop_gradient(opacities)
        k = jnp.sqrt(jnp.maximum(2.0 * jnp.log(
            jnp.maximum(op, 1e-12) / ALPHA_CUTOFF), 0.0))
        valid = valid & (op > ALPHA_CUTOFF)
    radius = k * jnp.sqrt(v1)
    rx = k * jnp.sqrt(jnp.maximum(cov00, 0.0))
    ry = k * jnp.sqrt(jnp.maximum(cov11, 0.0))
    # Cull gaussians whose cutoff support is fully outside the image.
    inside = (
        (mean2d[..., 0] + rx > 0)
        & (mean2d[..., 0] - rx < img_w)
        & (mean2d[..., 1] + ry > 0)
        & (mean2d[..., 1] - ry < img_h)
    )
    valid = valid & inside
    radius = jnp.where(valid, radius, 0.0)
    rx = jnp.where(valid, rx, 0.0)
    ry = jnp.where(valid, ry, 0.0)
    depth = jnp.where(valid, tz, jnp.inf)
    return Projected(mean2d, conic, depth, radius, valid, rx=rx, ry=ry)


def w2c_from_camera_vector(camera: jax.Array) -> jax.Array:
    """18-dim OpenGL camera vector -> (4, 4) OpenCV world-to-camera matrix."""
    from ...utils.cameras import camera_c2w, opengl_to_opencv

    c2w = camera_c2w(camera)
    c2w_cv = jnp.concatenate(
        [opengl_to_opencv(c2w[:3, :4]), jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], 0
    )
    return jnp.linalg.inv(c2w_cv)
