import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.ops.gaussian import NUM_GAUSSIAN_CHANNELS, convert_gaussians
from prometheus_tpu.utils import make_camera, sample_rays


def make_inputs(B=1, N=2, h=8, w=8):
    params = jnp.zeros((B, N, NUM_GAUSSIAN_CHANNELS, h, w))
    cam = make_camera(jnp.eye(3, 4), 10.0, 10.0, w / 2, h / 2, float(h), float(w))
    cams = jnp.tile(cam, (B, N, 1))
    return params, cams


def test_shapes_and_activation_ranges():
    B, N, h, w = 2, 3, 8, 8
    params = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, 14, h, w)), jnp.float32)
    _, cams = make_inputs(B, N, h, w)
    cams = jnp.tile(make_camera(jnp.eye(3, 4), 10.0, 10.0, 4.0, 4.0, 8.0, 8.0), (B, N, 1))
    xyz, feats, opac, scales, rots = convert_gaussians(params, cams)
    P = N * h * w
    assert xyz.shape == (B, P, 3)
    assert feats.shape == (B, P, 1, 3)
    assert opac.shape == (B, P, 1)
    assert scales.shape == (B, P, 3)
    assert rots.shape == (B, P, 4)
    assert float(feats.min()) >= 0 and float(feats.max()) <= 1
    assert float(opac.min()) >= 0 and float(opac.max()) <= 1
    assert float(scales.min()) >= 0.001 and float(scales.max()) <= 1.0
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rots), axis=-1), 1.0, atol=1e-5)


def test_mvsplat_zero_params_golden():
    # zero raw params: depth = sigmoid(0)=0.5 -> (z_near+z_far)/2; color=op=0.5;
    # scales = (s_min+s_max)/2; rotation undefined direction but normalized.
    params, cams = make_inputs()
    xyz, feats, opac, scales, rots = convert_gaussians(
        params, cams, z_near=1.0, z_far=3.0, s_min=0.1, s_max=0.3
    )
    np.testing.assert_allclose(np.asarray(feats), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(opac), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scales), 0.2, atol=1e-6)
    # xyz must lie exactly depth=2 along the normalized per-pixel rays
    rays_o, rays_d = sample_rays(cams, 8, 8)
    expected = (rays_o + 2.0 * rays_d).reshape(1, -1, 3)
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(expected), atol=1e-5)


def test_uv_offset_moves_points():
    params, cams = make_inputs(N=1)
    shifted = params.at[:, :, 3, :, :].set(0.05)  # uv_offset u channel
    xyz0 = convert_gaussians(params, cams)[0]
    xyz1 = convert_gaussians(shifted, cams)[0]
    assert float(jnp.abs(xyz1 - xyz0).max()) > 1e-4


def test_gslrm_mode():
    params, cams = make_inputs(N=1)
    xyz, feats, opac, scales, rots = convert_gaussians(params, cams, mode="gslrm")
    np.testing.assert_allclose(np.asarray(opac), 1 / (1 + np.exp(2.0)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scales), np.exp(-2.3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feats), 0.0, atol=1e-6)  # raw colors


def test_director3d_mode():
    params, cams = make_inputs(N=1)
    xyz, feats, opac, scales, rots = convert_gaussians(params, cams, mode="director3d")
    np.testing.assert_allclose(np.asarray(opac), 0.01, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scales), 0.01, atol=1e-5)
    # zero raw rotation + (1,0,0,0) offset -> identity quaternion
    np.testing.assert_allclose(np.asarray(rots[..., 0]), 1.0, atol=1e-6)
    # depth = 0*mul + 1.85 along rays
    rays_o, rays_d = sample_rays(cams, 8, 8)
    expected = (rays_o + 1.85 * rays_d).reshape(1, -1, 3)
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(expected), atol=1e-5)


def test_bad_mode_raises():
    params, cams = make_inputs(N=1)
    with pytest.raises(ValueError):
        convert_gaussians(params, cams, mode="nope")
