import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.models import (
    CLIPTextModel,
    CLIPTokenizer,
    MVLDMModel,
    MultiViewUNet,
    TrajDiTModel,
    camera_to_token,
    token_to_camera,
)
from prometheus_tpu.utils import get_random_cameras


SMALL_UNET = dict(
    model_channels=32, num_head_channels=16, context_dim=64,
    channel_mult=(1, 2), num_res_blocks=1, attention_ds=(1, 2),
    disable_3d_attentions=(1, 0, 0, 0, 0),  # 2 enc + 1 mid + 2 dec sites
    use_checkpoint=False,
)


def test_unet_shapes_and_site_count(key):
    unet = MultiViewUNet(in_channels=15, out_channels=15, **SMALL_UNET)
    BN, C, H, W = 4, 15, 16, 16
    x = jnp.zeros((BN, C, H, W))
    t = jnp.zeros((BN,))
    ctx = jnp.zeros((BN, 7, 64))
    vars_ = unet.init(key, x, t, ctx, num_frames=2)
    out = unet.apply(vars_, x, t, ctx, num_frames=2)
    assert out.shape == (BN, 15, H, W)
    # attention site count: levels=2, res_blocks=1, attn at both levels:
    # encoder 2 + middle 1 + decoder 2*(1+1)=4 -> ... count actual params
    names = [k for k in vars_["params"] if "attn" in k]
    assert len(names) == 2 + 1 + 4  # matches topology


def test_unet_cross_view_mixing(key):
    unet = MultiViewUNet(in_channels=8, out_channels=8, **SMALL_UNET)
    B, N, C, H, W = 1, 2, 8, 16, 16
    x = jax.random.normal(key, (B * N, C, H, W))
    t = jnp.full((B * N,), 10.0)
    ctx = jax.random.normal(key, (B * N, 7, 64))
    vars_ = unet.init(key, x, t, ctx, num_frames=N)
    # conv_out / proj_out are zero-initialized; nudge all params so the
    # output is non-degenerate and cross-view influence is observable.
    leaves, treedef = jax.tree.flatten(vars_)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    vars_ = jax.tree.unflatten(
        treedef,
        [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    out0 = unet.apply(vars_, x, t, ctx, num_frames=N)
    # change view 1 input; view 0 output must change via 3D attention
    x2 = x.at[1].add(1.0)
    out1 = unet.apply(vars_, x2, t, ctx, num_frames=N)
    assert float(jnp.abs(out1[0] - out0[0]).max()) > 1e-6
    # with num_frames=1 (2D attention) views are independent
    out0_2d = unet.apply(vars_, x, t, ctx, num_frames=1)
    out1_2d = unet.apply(vars_, x2, t, ctx, num_frames=1)
    np.testing.assert_allclose(np.asarray(out1_2d[0]), np.asarray(out0_2d[0]), atol=1e-6)


def test_unet_zero_init_output(key):
    unet = MultiViewUNet(in_channels=8, out_channels=8, **SMALL_UNET)
    x = jax.random.normal(key, (2, 8, 16, 16))
    vars_ = unet.init(key, x, jnp.zeros((2,)), jnp.zeros((2, 7, 64)), num_frames=1)
    out = unet.apply(vars_, x, jnp.zeros((2,)), jnp.zeros((2, 7, 64)), num_frames=1)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # conv_out zero-init


def test_mvldm_denoise_path(key):
    model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0),
        use_checkpoint=False, clip_layers=2, clip_width=64,
        vae_ch=32, vae_ch_mult=(1, 2), image_size=32,
    )
    B, N, h, w = 1, 2, 16, 16
    lat = jax.random.normal(key, (B, N, 9, h, w))  # 8 latents + 1 mask ch
    txt = jax.random.normal(key, (B, 7, 64))
    t = jnp.zeros((B, N))
    cams = get_random_cameras(key, N, size=128)[None]
    imgs_init = jnp.zeros((B, N, 3, 32, 32))
    ids_init = jnp.zeros((B, 77), jnp.int32)
    vars_ = model.init(key, imgs_init, ids_init, lat, txt, t, cams,
                       method=MVLDMModel.init_everything)
    out = model.apply(vars_, lat, txt, t, cams, method=MVLDMModel.denoise)
    assert out.shape == (B, N, 8, h, w)
    # text encoding
    emb = model.apply(vars_, ids_init, method=MVLDMModel.encode_text)
    assert emb.shape == (B, 77, 64)
    # encode/decode roundtrip shapes
    imgs = jax.random.normal(key, (B, N, 3, 32, 32))
    z = model.apply(vars_, imgs, method=MVLDMModel.encode_image)
    assert z.shape == (B, N, 4, 16, 16)
    rec = model.apply(vars_, z, method=MVLDMModel.decode_latent)
    assert rec.shape == (B, N, 3, 32, 32)


def test_camera_token_roundtrip(key):
    cams = get_random_cameras(key, 5, size=256)[None]
    tokens = camera_to_token(cams)
    assert tokens.shape == (1, 5, 11)
    back = token_to_camera(tokens, image_size=256)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cams), atol=1e-4)


def test_trajdit_forward(key):
    model = TrajDiTModel(hidden_size=64, num_blocks=2, num_heads=4, text_dim=32)
    x = jax.random.normal(key, (2, 29, 11))
    y = jax.random.normal(key, (2, 7, 32))
    t = jnp.asarray([10.0, 500.0])
    vars_ = model.init(key, x, y, t)
    out = model.apply(vars_, x, y, t)
    assert out.shape == (2, 29, 11)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init out_block


def test_clip_text_model(key):
    model = CLIPTextModel(width=64, num_heads=4, num_layers=2, vocab_size=1000)
    ids = jnp.asarray([[1, 5, 9] + [0] * 74])
    vars_ = model.init(key, ids)
    out = model.apply(vars_, ids)
    assert out.shape == (1, 77, 64)
    # causal: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 50].set(7)
    out2 = model.apply(vars_, ids2)
    np.testing.assert_allclose(np.asarray(out2[0, :50]), np.asarray(out[0, :50]),
                               atol=1e-5)
    assert float(jnp.abs(out2[0, 50:] - out[0, 50:]).max()) > 1e-6


def test_tokenizer_fallback_shapes():
    tok = CLIPTokenizer()  # no vocab file -> hash fallback
    assert not tok.is_exact
    ids = tok(["a photo of a cat", "hello"])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == 49406  # sot
    assert 49407 in ids[0]     # eot present
    # deterministic
    ids2 = tok(["a photo of a cat", "hello"])
    np.testing.assert_array_equal(ids, ids2)
