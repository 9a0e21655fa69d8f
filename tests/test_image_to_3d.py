import jax
import jax.numpy as jnp
import pytest

from prometheus_tpu.models import CLIPImageEncoder


@pytest.mark.slow
def test_image_to_3d_path(tiny_pipeline_i23d):
    pipe, cams = tiny_pipeline_i23d
    key = jax.random.PRNGKey(0)
    ref = jax.random.uniform(key, (1, 1, 3, 32, 32), minval=-1, maxval=1)
    result = pipe.generate_image_to_3d(
        ref, cams, key, ref_idx=(0,), num_inference_steps=2,
        render_size=32, latent_hw=16)
    assert result["latents_pred"].shape == (1, 4, 8, 16, 16)
    assert bool(jnp.isfinite(result["images_gs_render"]).all())
    # the reference view's latents are pinned: decoded ref view should match
    # the pinned latents (sampled latents at idx 0 == encoded ref latents)
    enc = pipe.mvldm.model.apply(
        pipe.mvldm_params, ref,
        method=type(pipe.mvldm.model).encode_image)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(result["latents_pred"][0, 0, :4]),
        np.asarray(enc[0, 0]), atol=1e-5)


@pytest.fixture()
def tiny_pipeline_i23d(key):
    from prometheus_tpu.models import GSDecoderModel, MVLDMModel, TrajDiTModel
    from prometheus_tpu.models.depth_anything import make_depth_fn
    from prometheus_tpu.pipeline import PrometheusPipeline
    from prometheus_tpu.systems import MVLDMSystem, TrajDiTSystem
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.utils import get_random_cameras

    mvldm_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32)
    B, N, hw = 1, 4, 16
    cams = get_random_cameras(key, N, size=32)[None]
    mvldm_params = mvldm_model.init(
        key, jnp.zeros((B, N, 3, 32, 32)), jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, hw, hw)), jnp.zeros((B, 77, 64)),
        jnp.zeros((B, N)), cams, method=MVLDMModel.init_everything)
    gsdec = GSDecoderModel(dit_hidden_size=32, dit_depth=1, dit_num_heads=4,
                           vae_ch=16 * 2, vae_ch_mult=(1, 2), max_num_images=4)
    gsdec_vars = gsdec.init(key, jnp.zeros((B, 1, 3, 32, 32)),
                            jnp.zeros((B, N, 14, hw, hw)),
                            method=GSDecoderModel.init_everything)
    traj_model = TrajDiTModel(hidden_size=32, num_blocks=1, num_heads=4,
                              text_dim=64)
    traj_params = traj_model.init(key, jnp.zeros((1, 29, 11)),
                                  jnp.zeros((1, 77, 64)), jnp.zeros((1,)))
    img_enc = CLIPImageEncoder(image_size=28, patch=14, width=32,
                               num_heads=4, num_layers=1, proj_dim=64)
    img_params = img_enc.init(key, jnp.zeros((1, 3, 32, 32)))
    pipe = PrometheusPipeline(
        mvldm=MVLDMSystem(model=mvldm_model,
                          schedule=make_schedule("vprediction"),
                          num_pred_views=N),
        mvldm_params=mvldm_params,
        traj=TrajDiTSystem(model=traj_model), traj_params=traj_params,
        gsdecoder=gsdec, gsdecoder_vars=gsdec_vars,
        gs_kwargs=dict(z_near=0.1, z_far=10.0),
        image_encoder=img_enc, image_encoder_params=img_params,
        depth_fn=make_depth_fn(key),
    )
    return pipe, cams
