"""End-to-end pipeline smoke: tiny models, text -> trajectory -> latents ->
gaussians -> renders. This is the M2/M3 milestone test (BASELINE configs 3/4
at toy scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.models import GSDecoderModel, MVLDMModel, TrajDiTModel
from prometheus_tpu.pipeline import PrometheusPipeline
from prometheus_tpu.systems import MVLDMSystem, TrajDiTSystem
from prometheus_tpu.ops.schedulers import make_schedule


@pytest.fixture(scope="module")
def tiny_pipeline():
    key = jax.random.PRNGKey(0)
    mvldm_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32,
    )
    B, N, hw = 1, 4, 16
    lat = jnp.zeros((B, N, 9, hw, hw))
    txt = jnp.zeros((B, 77, 64))
    t = jnp.zeros((B, N))
    from prometheus_tpu.utils import get_random_cameras

    cams = get_random_cameras(key, N, size=32)[None]
    mvldm_params = mvldm_model.init(
        key, jnp.zeros((B, N, 3, 32, 32)), jnp.zeros((B, 77), jnp.int32),
        lat, txt, t, cams, method=MVLDMModel.init_everything)

    traj_model = TrajDiTModel(hidden_size=32, num_blocks=1, num_heads=4,
                              text_dim=64)
    traj_params = traj_model.init(
        key, jnp.zeros((1, 29, 11)), jnp.zeros((1, 77, 64)), jnp.zeros((1,)))

    gsdec = GSDecoderModel(
        dit_hidden_size=32, dit_depth=1, dit_num_heads=4,
        vae_ch=16, vae_ch_mult=(1, 2), max_num_images=4,
    )
    gsdec_vars = gsdec.init(key, jnp.zeros((B, N, 14, hw, hw)))

    mv_sys = MVLDMSystem(model=mvldm_model,
                         schedule=make_schedule("vprediction"),
                         num_pred_views=4)
    traj_sys = TrajDiTSystem(model=traj_model)
    return PrometheusPipeline(
        mvldm=mv_sys, mvldm_params=mvldm_params,
        traj=traj_sys, traj_params=traj_params,
        gsdecoder=gsdec, gsdecoder_vars=gsdec_vars,
        gs_kwargs=dict(z_near=0.1, z_far=10.0),
    )


def test_m2_sampling(tiny_pipeline):
    """M2: text-conditioned multi-view RGB-D latent sampling."""
    p = tiny_pipeline
    key = jax.random.PRNGKey(1)
    text_emb = p.encode_text(["a red cube"])
    uncond = p.encode_text([""])
    from prometheus_tpu.utils import get_random_cameras

    cams = get_random_cameras(key, 4, size=32)[None]
    latents = p.mvldm.sample(
        p.mvldm_params, key, cams, text_emb, uncond,
        num_inference_steps=4, guidance_scale=7.5, guidance_type="joint",
        cfg_rescale=0.7, latent_hw=16,
    )
    assert latents.shape == (1, 4, 8, 16, 16)
    assert bool(jnp.isfinite(latents).all())


@pytest.mark.parametrize("gtype", ["text", "pose", "hybrid"])
def test_guidance_variants(tiny_pipeline, gtype):
    p = tiny_pipeline
    key = jax.random.PRNGKey(2)
    from prometheus_tpu.utils import get_random_cameras

    cams = get_random_cameras(key, 2, size=32)[None]
    text_emb = p.encode_text(["x"])
    latents = p.mvldm.sample(
        p.mvldm_params, key, cams, text_emb, text_emb,
        num_inference_steps=2, guidance_type=gtype, latent_hw=16,
    )
    assert latents.shape == (1, 2, 8, 16, 16)
    assert bool(jnp.isfinite(latents).all())


def test_m3_full_generate(tiny_pipeline):
    """M3: full text -> trajectory -> latents -> 3DGS -> renders."""
    p = tiny_pipeline
    result = p.generate(
        "a cozy cabin", jax.random.PRNGKey(3),
        num_views=4, num_inference_steps=2, num_traj_steps=4,
        render_size=32, image_size=32, latent_hw=16,
    )
    assert result["cameras"].shape == (1, 4, 18)
    assert result["images_pred"].shape == (1, 4, 3, 32, 32)
    assert result["depths_pred"].shape == (1, 4, 1, 32, 32)
    assert result["images_gs_render"].shape == (1, 4, 3, 32, 32)
    assert result["gaussians"][0].shape[0] == 1
    for k, v in result.items():
        if isinstance(v, jax.Array):
            assert bool(jnp.isfinite(v).all()), k


def test_orbit_video(tiny_pipeline):
    p = tiny_pipeline
    result = p.generate(
        "scene", jax.random.PRNGKey(4), num_views=4, num_inference_steps=2,
        num_traj_steps=2, render_size=32, image_size=32, latent_hw=16,
    )
    frames = p.render_orbit_video(result["gaussians"], result["dense_cameras"],
                                  num_frames=6, size=32, chunk=3)
    assert frames.shape == (6, 3, 32, 32)
    assert np.isfinite(frames).all()


def test_cfg_interval_fast_mode(tiny_pipeline):
    """cfg_interval_frac: the guided prefix matches full-CFG exactly (same
    keys, same steps), the unguided suffix equals running guidance 'none'
    from the prefix state; frac=1.0 reproduces the default path."""
    p = tiny_pipeline
    key = jax.random.PRNGKey(3)
    from prometheus_tpu.utils import get_random_cameras

    cams = get_random_cameras(key, 2, size=32)[None]
    text_emb = p.encode_text(["a chair"])
    uncond = p.encode_text([""])
    kw = dict(num_inference_steps=4, guidance_scale=7.5,
              guidance_type="joint", cfg_rescale=0.7, latent_hw=16)
    # the tiny model's zero-init conv_out makes cond == uncond == 0 and CFG
    # vacuous; give the output head real weights so guidance has an effect
    params = jax.tree.map(lambda x: x, p.mvldm_params)
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: jax.random.normal(jax.random.PRNGKey(7), x.shape,
                                          x.dtype) * 0.05
        if any(getattr(k, "key", "") == "conv_out" for k in path) else x,
        params)
    full = p.mvldm.sample(params, key, cams, text_emb, uncond, **kw)
    frac1 = p.mvldm.sample(params, key, cams, text_emb, uncond,
                           cfg_interval_frac=1.0, **kw)
    np.testing.assert_allclose(np.asarray(full), np.asarray(frac1),
                               atol=1e-6)
    fast = p.mvldm.sample(params, key, cams, text_emb, uncond,
                          cfg_interval_frac=0.5, **kw)
    assert fast.shape == full.shape
    assert bool(jnp.isfinite(fast).all())
    # the fast path genuinely deviates after the switch (it ran unguided)
    assert float(jnp.abs(fast - full).max()) > 0


@pytest.mark.slow
def test_build_refiner_mv_sds(tiny_pipeline):
    """pipeline.build_refiner('mv_sds') runs the MV-SDS++ loop end-to-end.

    Covers the frozen_params wiring: the MV-LDM weights ride through the
    jitted refine programs as runtime arguments (one HBM copy,
    width-independent serialized programs — sds_pp.py frozen_params)."""
    from prometheus_tpu.utils import get_random_cameras

    p = tiny_pipeline
    refiner = p.build_refiner("mv_sds", total_iterations=2, num_views=2,
                              img_size=32, densification_interval=20)
    assert refiner.frozen_params is not None
    key = jax.random.PRNGKey(3)
    n = 24
    xyz = jax.random.uniform(key, (1, n, 3), minval=-1, maxval=1)
    xyz = xyz.at[..., 2].add(-3.0)
    g = (xyz, jnp.full((1, n, 1, 3), 0.5), jnp.full((1, n, 1), 0.8),
         jnp.full((1, n, 3), 0.05),
         jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, n, 1)))
    dense = get_random_cameras(key, 8, size=32)[None]
    text = jax.random.normal(key, (1, 77, 64)) * 0.02
    out = refiner.refine_gaussians(g, text, text * 0, dense, key)
    for a in out:
        assert bool(jnp.isfinite(a).all())
    assert float(jnp.abs(out[0][:, :n] - g[0]).max()) > 0  # moved
