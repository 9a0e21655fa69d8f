import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.models import AutoencoderKL, CrossViewDiTWrapped, GSDecoderModel
from prometheus_tpu.models.gs_decoder import decode_and_render
from prometheus_tpu.utils import get_random_cameras, raymap


SMALL_VAE = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1)


def test_vae_encode_decode_shapes(key):
    vae = AutoencoderKL(**SMALL_VAE)
    x = jnp.zeros((2, 3, 32, 32))
    vars_ = vae.init(key, x, sample_posterior=False)
    post = vae.apply(vars_, x, method=AutoencoderKL.encode)
    assert post.mean.shape == (2, 4, 16, 16)  # f = 2^(levels-1) = 2
    z = post.sample(key)
    out = vae.apply(vars_, z, method=AutoencoderKL.decode)
    assert out.shape == (2, 3, 32, 32)


def test_vae_extra_z_and_gaussian_head(key):
    vae = AutoencoderKL(decoder_extra_channels=24, decoder_out_ch=14,
                        use_ema_norm=True, **SMALL_VAE)
    z = jnp.zeros((1, 4, 16, 16))
    extra = jnp.zeros((1, 24, 16, 16))
    vars_ = vae.init(key, z, extra_z=extra, method=AutoencoderKL.decode)
    out = vae.apply(vars_, z, extra_z=extra, method=AutoencoderKL.decode)
    assert out.shape == (1, 14, 32, 32)
    # batch_stats exists for EMANorm
    assert "batch_stats" in vars_
    # train=True updates the magnitude EMA
    out2, new_state = vae.apply(
        vars_, z + 1.0, extra_z=extra, train=True,
        method=AutoencoderKL.decode, mutable=["batch_stats"],
    )
    leaves_old = jax.tree.leaves(vars_["batch_stats"])
    leaves_new = jax.tree.leaves(new_state["batch_stats"])
    assert any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(leaves_old, leaves_new)
    )


def test_diagonal_gaussian_kl_zero_for_standard_normal():
    from prometheus_tpu.models.vae import DiagonalGaussian

    moments = jnp.zeros((2, 8, 4, 4))  # mean 0, logvar 0
    dg = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(dg.kl()), 0.0, atol=1e-6)


def test_cross_view_dit_shapes(key):
    dit = CrossViewDiTWrapped(latent_channels=14, dit_channels=32,
                              hidden_size=64, depth=2, num_heads=4)
    x = jnp.zeros((1, 3, 14, 16, 16))
    vars_ = dit.init(key, x)
    out = dit.apply(vars_, x, t=1000.0)
    assert out.shape == (1, 3, 14, 16, 16)
    # adaLN-zero: blocks start as identity-ish, final layer zero -> conv_out of
    # upsampled zeros -> output equals conv_out bias pattern, must be finite
    assert bool(jnp.isfinite(out).all())


def test_cross_view_dit_views_interact(key):
    dit = CrossViewDiTWrapped(latent_channels=4, dit_channels=16,
                              hidden_size=32, depth=2, num_heads=4)
    x = jax.random.normal(key, (1, 2, 4, 8, 8))
    vars_ = dit.init(key, x)
    # perturb view 1 only; output for view 0 must change (joint attention).
    # adaLN gates are zero-initialized, so nudge every param with small random
    # noise (a constant offset saturates the softmax and hides interaction).
    leaves, treedef = jax.tree.flatten(vars_)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    vars_ = jax.tree.unflatten(
        treedef,
        [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    out0 = dit.apply(vars_, x, t=10.0)
    x2 = x.at[:, 1].add(1.0)
    out1 = dit.apply(vars_, x2, t=10.0)
    assert float(jnp.abs(out1[:, 0] - out0[:, 0]).max()) > 1e-6


def small_gsdecoder():
    return GSDecoderModel(
        use_cross_view_dit=True, use_ema_norm=True,
        dit_hidden_size=64, dit_depth=2, dit_num_heads=4,
        vae_ch=32, vae_ch_mult=(1, 2, 4),  # f=4 upsampling: 8->32
        max_num_images=4,
    )


def test_gsdecoder_m1_end_to_end(key):
    """M1 milestone: latents -> GSDecoder -> 3DGS -> rendered view (CPU fp32)."""
    model = small_gsdecoder()
    B, N, h, w = 1, 4, 8, 8
    latents = 0.1 * jax.random.normal(key, (B, N, 14, h, w))
    vars_ = model.init(key, latents)
    cams = get_random_cameras(key, N, size=32)[None]
    images, depths, masks, gaussians, _ = decode_and_render(
        model, vars_, latents, cams, cams, h=32, w=32,
        gs_kwargs={"z_near": 0.5, "z_far": 10.0},
    )
    assert images.shape == (B, N, 3, 32, 32)
    assert depths.shape == (B, N, 1, 32, 32)
    assert gaussians[0].shape == (B, N * 32 * 32, 3)
    assert bool(jnp.isfinite(images).all())
    assert float(masks.mean()) > 0.01  # something rendered


def test_gsdecoder_gradients(key):
    model = small_gsdecoder()
    B, N, h, w = 1, 2, 8, 8
    latents = 0.1 * jax.random.normal(key, (B, N, 14, h, w))
    vars_ = model.init(key, latents)
    cams = get_random_cameras(key, N, size=32)[None]
    params = vars_["params"]
    state = {k: v for k, v in vars_.items() if k != "params"}

    def loss_fn(params):
        images, depths, masks, _, _ = decode_and_render(
            model, {"params": params, **state}, latents, cams, cams, h=32, w=32,
            gs_kwargs={"z_near": 0.5, "z_far": 10.0},
        )
        return jnp.mean(images**2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)
    total = sum(float(jnp.abs(x).sum()) for x in flat)
    assert total > 0
