"""HTML scene viewer: export structure + shader-math parity.

No JS runtime exists in this image, so the WebGL vertex-shader math
(quat->cov3D, view transform, EWA Jacobian, low-pass, eigen extents) is
replicated here in numpy EXACTLY as written in the shader source and
checked against ``ops/gaussian/projection.py`` — the same math the real
renders use. A browser mismatch would be a transcription bug this catches.
"""
import base64
import os
import re

import numpy as np
import pytest


def _synthetic_gaussians(rng, n):
    xyz = rng.normal(0, 1.0, (1, n, 3))
    feats = rng.uniform(0, 1, (1, n, 1, 3))
    opacity = rng.uniform(0.3, 1.0, (1, n, 1))
    scales = np.exp(rng.normal(-3.5, 0.4, (1, n, 3)))
    rots = rng.normal(0, 1, (1, n, 4))
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)
    return (xyz, feats, opacity, scales, rots)


def test_export_viewer_html_embed(tmp_path):
    from prometheus_tpu.utils.gs_io import export_splat
    from prometheus_tpu.utils.viewer_html import export_viewer_html

    g = _synthetic_gaussians(np.random.default_rng(0), 500)
    splat = str(tmp_path / "s.splat")
    n = export_splat(splat, g)
    assert n == 500

    out = export_viewer_html(str(tmp_path / "v.html"), splat, title="t500")
    html = open(out).read()
    assert "webgl2" in html and "t500" in html and "<canvas" in html
    b64 = re.search(r'EMBED_B64 = "([^"]*)"', html).group(1)
    data = base64.b64decode(b64)
    assert data == open(splat, "rb").read()

    # importance-ordered truncation
    out2 = export_viewer_html(str(tmp_path / "v2.html"), splat,
                              max_splats=100)
    b64 = re.search(r'EMBED_B64 = "([^"]*)"',
                    open(out2).read()).group(1)
    assert len(base64.b64decode(b64)) == 100 * 32

    # fetch mode embeds nothing
    out3 = export_viewer_html(str(tmp_path / "v3.html"), None,
                              fetch_url="s.splat")
    html3 = open(out3).read()
    assert 'EMBED_B64 = ""' in html3 and 'FETCH_URL = "s.splat"' in html3


def test_gaussians_to_splat_bytes_roundtrip():
    from prometheus_tpu.utils.viewer_html import gaussians_to_splat_bytes

    g = _synthetic_gaussians(np.random.default_rng(1), 64)
    data = gaussians_to_splat_bytes(g)
    assert len(data) == 64 * 32


def _js_cov2d(pos, scale, quat, view, fx, fy):
    """The viewer vertex shader's covariance math, transcribed verbatim."""
    w, x, y, z = quat / np.linalg.norm(quat)
    R = np.array([  # rows (math convention); JS builds the same via columns
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    M = R * scale[None, :]
    cov3 = M @ M.T
    tv = view[:3, :3] @ pos + view[:3, 3]
    d = -tv[2]
    assert d > 0.05
    T = view[:3, :3].copy()
    T[2, :] *= -1.0
    J = np.array([[fx / d, 0.0, -fx * tv[0] / (d * d)],
                  [0.0, fy / d, -fy * tv[1] / (d * d)]])
    A = J @ T
    c2 = A @ cov3 @ A.T
    c2[0, 0] += 0.3
    c2[1, 1] += 0.3
    center = np.array([fx * tv[0] / d, fy * tv[1] / d])
    return c2, center, d


def test_viewer_shader_math_matches_projection():
    """JS cov2D == project_gaussians cov2D (up to the OpenGL->OpenCV y-flip:
    y_gl = -y_cv mirrors the off-diagonal)."""
    import jax.numpy as jnp

    from prometheus_tpu.ops.gaussian.projection import project_gaussians

    rng = np.random.default_rng(2)
    n = 32
    means = rng.normal(0, 0.5, (n, 3))
    scales = np.exp(rng.normal(-2.5, 0.3, (n, 3)))
    quats = rng.normal(0, 1, (n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    # OpenGL view: camera at +3z looking at origin (identity rotation)
    view = np.eye(4)
    view[2, 3] = -3.0
    fx = fy = 200.0
    H = W = 256

    # equivalent OpenCV w2c: flip y and z rows
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    w2c_cv = flip @ view

    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(w2c_cv), fx, fy, W / 2, H / 2, H, W)
    conic = np.asarray(proj.conic)
    mean2d = np.asarray(proj.mean2d)
    valid = np.asarray(proj.valid)

    checked = 0
    for i in range(n):
        if not valid[i]:
            continue
        c2, center, d = _js_cov2d(means[i], scales[i], quats[i], view, fx, fy)
        # conic -> cov (invert the reference's inverse covariance)
        a, b, c = conic[i]
        det = a * c - b * b
        cov_ref = np.array([[c, -b], [-b, a]]) / det
        # y-flip between conventions mirrors the off-diagonal only.
        # The EWA tangent-plane clamp only differs off-center; these
        # gaussians sit near the axis so the clamp is inactive.
        # f32 reference vs f64 transcription: ~1e-4 relative round-trip
        assert np.allclose(c2[0, 0], cov_ref[0, 0], rtol=1e-3)
        assert np.allclose(c2[1, 1], cov_ref[1, 1], rtol=1e-3)
        assert np.allclose(c2[0, 1], -cov_ref[0, 1], rtol=1e-3, atol=1e-6)
        # screen center: JS y-up pixels vs reference y-down pixels + principal
        assert np.allclose(center[0] + W / 2, mean2d[i, 0], rtol=1e-5)
        assert np.allclose(-center[1] + H / 2, mean2d[i, 1], rtol=1e-5)
        assert d > 0
        checked += 1
    assert checked >= n // 2


def test_view_scene_cli(tmp_path, monkeypatch):
    import subprocess
    import sys

    from prometheus_tpu.utils.gs_io import export_gaussians

    g = _synthetic_gaussians(np.random.default_rng(3), 128)
    base = str(tmp_path / "scene")
    export_gaussians(base, g)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/view_scene.py", base + ".splat",
         "--out", str(tmp_path / "view.html")],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    assert os.path.exists(tmp_path / "view.html")
    # .ply input path
    r2 = subprocess.run(
        [sys.executable, "tools/view_scene.py", base + ".ply",
         "--out", str(tmp_path / "view2.html"), "--max_splats", "50"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r2.returncode == 0, r2.stderr
    html = open(tmp_path / "view2.html").read()
    b64 = re.search(r'EMBED_B64 = "([^"]*)"', html).group(1)
    assert len(base64.b64decode(b64)) == 50 * 32
