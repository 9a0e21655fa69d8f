import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.refiners import (
    GSRefinerSDSPlusPlus,
    activate,
    densify_and_prune,
    make_buffer,
    num_alive,
)
from prometheus_tpu.utils import get_random_cameras


def make_gaussians(key, n=64):
    k1, k2 = jax.random.split(key)
    xyz = jax.random.uniform(k1, (1, n, 3), minval=-1, maxval=1)
    xyz = xyz.at[..., 2].add(-3.0)
    feats = jax.random.uniform(k2, (1, n, 1, 3), minval=0.1, maxval=0.9)
    opac = jnp.full((1, n, 1), 0.8)
    scales = jnp.full((1, n, 3), 0.05)
    rots = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, n, 1))
    return (xyz, feats, opac, scales, rots)


def test_buffer_roundtrip(key):
    g = make_gaussians(key, n=32)
    buf = make_buffer(g, capacity=64)
    assert int(num_alive(buf)) == 32
    g2 = activate(buf)
    for a, b in zip(g, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b[:, :32]),
                                   atol=2e-4, rtol=1e-3)
    # dead slots render with zero opacity
    assert float(g2[2][:, 32:].max()) == 0.0


def test_densify_clone_split_prune(key):
    g = make_gaussians(key, n=16)
    # make gaussian 0 big (split candidate), 1 small (clone candidate)
    g = (g[0], g[1], g[2], g[3].at[0, 0].set(0.1).at[0, 1].set(0.001), g[4])
    buf = make_buffer(g, capacity=32)
    stat = jnp.zeros(32).at[0].set(1.0).at[1].set(1.0)  # both above threshold
    out = densify_and_prune(buf, stat, key, grad_threshold=0.5,
                            split_scale_threshold=0.02)
    assert int(num_alive(out)) == 18  # 16 + 2 new
    # split original shrank
    assert float(jnp.exp(out.scales_raw[0]).max()) < 0.1

    # prune: kill everything via opacity threshold 1.0
    out2 = densify_and_prune(buf, jnp.zeros(32), key, opacity_prune=1.0)
    assert int(num_alive(out2)) == 0


def test_densify_respects_capacity(key):
    g = make_gaussians(key, n=16)
    buf = make_buffer(g, capacity=17)  # one free slot
    stat = jnp.ones(17)
    out = densify_and_prune(buf, stat, key, grad_threshold=0.5)
    assert int(num_alive(out)) == 17  # capacity-limited


def _tiny_towers(img_size=32):
    from prometheus_tpu.models import AutoencoderKL, MultiViewUNet

    unet = MultiViewUNet(in_channels=4, out_channels=4, model_channels=16,
                         num_head_channels=8, context_dim=16,
                         channel_mult=(1, 2), num_res_blocks=1,
                         attention_ds=(2,), disable_3d_attentions=(1, 1, 1),
                         use_checkpoint=False)
    vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1)
    kp = jax.random.PRNGKey(1)
    up = unet.init(kp, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                   jnp.zeros((1, 7, 16)), num_frames=1)
    vp = vae.init(kp, jnp.zeros((1, 3, img_size, img_size)),
                  sample_posterior=False)
    return unet, vae, up, vp


@pytest.mark.slow
def test_sds_refiner_frozen_params_matches_closure(key):
    """frozen_params (weights as jit args) == legacy closure form, exactly.

    The params-first form exists so flagship-width refine programs don't
    embed the tower weights as serialized MLIR constants (sds_pp.py
    ``frozen_params`` docstring); the math must be unchanged.
    """
    from prometheus_tpu.models import AutoencoderKL
    from prometheus_tpu.utils import get_random_cameras

    img_size = 32
    unet, vae, up, vp = _tiny_towers(img_size)
    fp = {"up": up, "vp": vp}

    common = dict(num_views=2, img_size=img_size, total_iterations=3,
                  densification_interval=30, guidance_scale=3.0)
    ref_closure = GSRefinerSDSPlusPlus(
        denoise_fn=lambda lat, t, emb: unet.apply(
            up, lat, t.astype(jnp.float32), emb, num_frames=1),
        encode_fn=lambda x: vae.apply(
            vp, x, method=AutoencoderKL.encode).mode() * 0.18215,
        decode_fn=lambda z: vae.apply(
            vp, z / 0.18215, method=AutoencoderKL.decode),
        **common)
    ref_args = GSRefinerSDSPlusPlus(
        denoise_fn=lambda p, lat, t, emb: unet.apply(
            p["up"], lat, t.astype(jnp.float32), emb, num_frames=1),
        encode_fn=lambda p, x: vae.apply(
            p["vp"], x, method=AutoencoderKL.encode).mode() * 0.18215,
        decode_fn=lambda p, z: vae.apply(
            p["vp"], z / 0.18215, method=AutoencoderKL.decode),
        frozen_params=fp, **common)

    g = make_gaussians(key, n=16)
    dense = get_random_cameras(key, 8, size=img_size)[None]
    text = jax.random.normal(key, (1, 7, 16)) * 0.02
    out_c = ref_closure.refine_gaussians(g, text, text * 0, dense, key)
    out_a = ref_args.refine_gaussians(g, text, text * 0, dense, key)
    # not bit-identical: constant-embedded vs argument weights change XLA's
    # folding/fusion, and Adam amplifies float-level divergence to lr scale
    # (rots lr 1e-3). A WIRING error (wrong params reaching a tower) would
    # produce wholesale disagreement, not lr-scale drift.
    for a, b in zip(out_c, out_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_sds_refiner_smoke(key):
    """End-to-end SDS++ smoke with a tiny 2D U-Net + tiny VAE as guidance."""
    from prometheus_tpu.models import AutoencoderKL, MultiViewUNet

    img_size = 32
    unet = MultiViewUNet(in_channels=4, out_channels=4, model_channels=16,
                         num_head_channels=8, context_dim=16,
                         channel_mult=(1, 2), num_res_blocks=1,
                         attention_ds=(2,), disable_3d_attentions=(1, 1, 1),
                         use_checkpoint=False)
    vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1)
    kp = jax.random.PRNGKey(1)
    up = unet.init(kp, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                   jnp.zeros((1, 7, 16)), num_frames=1)
    vp = vae.init(kp, jnp.zeros((1, 3, img_size, img_size)),
                  sample_posterior=False)

    def denoise_fn(lat, t, emb):
        return unet.apply(up, lat, t.astype(jnp.float32), emb, num_frames=1)

    def encode_fn(images):
        return vae.apply(vp, images, method=AutoencoderKL.encode).mode() * 0.18215

    def decode_fn(lat):
        return vae.apply(vp, lat / 0.18215, method=AutoencoderKL.decode)

    refiner = GSRefinerSDSPlusPlus(
        denoise_fn=denoise_fn, encode_fn=encode_fn, decode_fn=decode_fn,
        num_views=2, img_size=img_size, total_iterations=6,
        densification_interval=3, guidance_scale=3.0,
    )
    g = make_gaussians(key, n=32)
    dense = get_random_cameras(key, 8, size=img_size)[None]
    text_emb = jax.random.normal(key, (1, 7, 16)) * 0.02
    out = refiner.refine_gaussians(g, text_emb, text_emb * 0, dense, key)
    assert out[0].shape[0] == 1
    for a in out:
        assert bool(jnp.isfinite(a).all())
    # positions moved
    moved = float(jnp.abs(out[0][:, :32] - g[0]).max())
    assert moved > 0
