import jax
import jax.numpy as jnp
import numpy as np

from prometheus_tpu.models import GSDecoderModel, MVLDMModel
from prometheus_tpu.ops.schedulers import make_schedule
from prometheus_tpu.systems import GSDecoderSystem, MVLDMSystem
from prometheus_tpu.utils import get_random_cameras


def test_stage2_rendering_loss_grads(key):
    mv_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32)
    system = MVLDMSystem(model=mv_model, schedule=make_schedule("vprediction"))
    gs_model = GSDecoderModel(dit_hidden_size=32, dit_depth=1,
                              dit_num_heads=4, vae_ch=32, vae_ch_mult=(1, 2),
                              max_num_images=4)
    gs_vars = gs_model.init(key, jnp.zeros((1, 2, 3, 32, 32)),
                            jnp.zeros((1, 2, 14, 16, 16)),
                            method=GSDecoderModel.init_everything)
    gs_system = GSDecoderSystem(model=gs_model, render_size=32,
                                gs_kwargs=dict(z_near=0.1, z_far=10.0))

    B, n = 1, 2
    cams = get_random_cameras(key, n, size=32)[None]
    latents_pred = 0.2 * jax.random.normal(key, (B, n, 8, 16, 16))
    images_gt = jax.random.uniform(key, (B, n, 3, 32, 32), minval=-1, maxval=1)
    depths_gt = jax.random.uniform(key, (B, n, 1, 32, 32), minval=0.1, maxval=1)

    def loss_fn(lat):
        loss, metrics = system.rendering_loss(
            gs_system, gs_vars, lat, cams, images_gt, depths_gt, cams,
            rendering_size=32)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(latents_pred)
    assert bool(jnp.isfinite(loss))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0  # grads reach the latents end-to-end
