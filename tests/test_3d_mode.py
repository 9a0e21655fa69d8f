import jax
import jax.numpy as jnp

from prometheus_tpu.models import GSDecoderModel, MVLDMModel
from prometheus_tpu.ops.schedulers import make_schedule
from prometheus_tpu.systems import GSDecoderSystem, MVLDMSystem
from prometheus_tpu.utils import get_random_cameras


def test_sample_with_3d_mode(key):
    mv_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32)
    B, N, hw = 1, 2, 16
    cams = get_random_cameras(key, N, size=32)[None]
    params = mv_model.init(
        key, jnp.zeros((B, N, 3, 32, 32)), jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, hw, hw)), jnp.zeros((B, 77, 64)),
        jnp.zeros((B, N)), cams, method=MVLDMModel.init_everything)
    system = MVLDMSystem(model=mv_model, schedule=make_schedule("vprediction"),
                         num_pred_views=N)

    gs_model = GSDecoderModel(dit_hidden_size=32, dit_depth=1,
                              dit_num_heads=4, vae_ch=32, vae_ch_mult=(1, 2),
                              max_num_images=4)
    gs_vars = gs_model.init(key, jnp.zeros((B, 1, 3, 32, 32)),
                            jnp.zeros((B, N, 14, hw, hw)),
                            method=GSDecoderModel.init_everything)
    gs_system = GSDecoderSystem(model=gs_model, render_size=32,
                                gs_kwargs=dict(z_near=0.1, z_far=10.0))

    txt = jax.random.normal(key, (B, 77, 64)) * 0.02
    x0 = system.sample_with_3d_mode(
        params, gs_system, gs_vars, key, cams, txt, jnp.zeros_like(txt),
        num_inference_steps=4, use_3d_mode_every_m_steps=2,
        latent_hw=hw, render_size=32)
    assert x0.shape == (B, N, 8, hw, hw)
    assert bool(jnp.isfinite(x0).all())
