import jax
import jax.numpy as jnp
import numpy as np

from prometheus_tpu.models import CLIPImageEncoder, GMLDMModel
from prometheus_tpu.models.gm_ldm import GMLDMModel as _G
from prometheus_tpu.utils import get_random_cameras, raymap
from prometheus_tpu.utils.visualization import export_cameras_ply, frustum_corners, plot_cameras_png


def test_gmldm_paths(key):
    model = GMLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1, use_checkpoint=False,
        vae_ch=32, vae_ch_mult=(1, 2), image_size=32,
    )
    B, N, hw = 1, 2, 16
    cams = get_random_cameras(key, N, size=32)[None]
    rm = raymap(cams, hw, hw)
    lat_noisy = jax.random.normal(key, (B, N, 10, hw, hw))
    txt = jnp.zeros((B, 7, 64))
    t = jnp.zeros((B, N))
    imgs = jnp.zeros((B, N, 3, 32, 32))
    vars_ = model.init(key, imgs, lat_noisy, txt, t, rm, cams,
                       method=_G.init_everything)
    pred = model.apply(vars_, lat_noisy, txt, t, method=_G.denoise)
    assert pred.shape == (B, N, 4, hw, hw)
    z = model.apply(vars_, imgs, method=_G.encode_image)
    g = model.apply(vars_, z, rm, cams, method=_G.decode_gaussians)
    assert g[0].shape == (B, N * 32 * 32, 3)
    assert bool(jnp.isfinite(g[0]).all())


def test_clip_image_encoder_shapes(key):
    enc = CLIPImageEncoder(image_size=28, patch=14, width=64, num_heads=4,
                           num_layers=2, proj_dim=32)
    imgs = jax.random.uniform(key, (2, 3, 32, 32), minval=-1, maxval=1)
    vars_ = enc.init(key, imgs)
    out = enc.apply(vars_, imgs)
    # pooled+projected image_embeds, one vector per image (the reference's
    # CLIPVisionModelWithProjection(...).image_embeds, mv_ldm.py:159)
    assert out.shape == (2, 32)
    assert bool(jnp.isfinite(out).all())


def test_frustum_and_exports(tmp_path, key):
    cams = np.asarray(get_random_cameras(key, 5, size=64))
    pts = frustum_corners(cams[0])
    assert pts.shape == (5, 3)
    # apex is the camera center
    np.testing.assert_allclose(pts[0], cams[0][:12].reshape(3, 4)[:, 3],
                               atol=1e-6)
    ply = export_cameras_ply(str(tmp_path / "cams.ply"), cams)
    assert np.fromfile(ply, dtype=np.uint8).size > 100
    png = plot_cameras_png(str(tmp_path / "cams.png"), cams)
    from PIL import Image

    assert Image.open(png).size == (512, 512)
