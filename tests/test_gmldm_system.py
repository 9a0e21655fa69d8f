import jax
import jax.numpy as jnp

from prometheus_tpu.models.gm_ldm import GMLDMModel
from prometheus_tpu.systems import GMLDMSystem
from prometheus_tpu.utils import get_random_cameras, raymap


def make_setup(key):
    model = GMLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1, use_checkpoint=False,
        vae_ch=32, vae_ch_mult=(1, 2), image_size=32)
    B, N, hw = 1, 2, 16
    cams = get_random_cameras(key, N, size=32)[None]
    rm = raymap(cams, hw, hw)
    params = model.init(
        key, jnp.zeros((B, N, 3, 32, 32)), jnp.zeros((B, N, 10, hw, hw)),
        jnp.zeros((B, 7, 64)), jnp.zeros((B, N)), rm, cams,
        method=GMLDMModel.init_everything)
    return GMLDMSystem(model=model), params, cams


def test_gmldm_training_loss(key):
    system, params, cams = make_setup(key)
    batch = {
        "images_mv": jax.random.uniform(key, (1, 2, 3, 32, 32), minval=-1, maxval=1),
        "cameras_mv": cams,
        "text_emb": jax.random.normal(key, (1, 7, 64)) * 0.02,
        "uncond_text_emb": jnp.zeros((1, 7, 64)),
    }
    loss, metrics = system.loss(params, key, batch)
    assert bool(jnp.isfinite(loss))
    g = jax.grad(lambda p: system.loss(p, key, batch)[0])(params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_gmldm_sampling(key):
    system, params, cams = make_setup(key)
    txt = jax.random.normal(key, (1, 7, 64)) * 0.02
    out = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                        num_inference_steps=2, latent_hw=16, render_size=32)
    assert out["latents_pred"].shape == (1, 2, 4, 16, 16)
    assert out["images_gs_render"].shape == (1, 2, 3, 32, 32)
    assert bool(jnp.isfinite(out["images_gs_render"]).all())
