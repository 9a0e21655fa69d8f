"""View-sharded (sequence-parallel) sampling == single-program sampling.

The reference's inference is single-GPU (``/root/reference/inference.py:44-59``);
``MVLDMSystem.sample_view_sharded`` shards the N views over a mesh axis with
K/V all-gathers at the 3D-attention sites and psum'd CFG-rescale stats. These
tests pin that the sharded program reproduces ``sample`` on the virtual
8-device CPU mesh, including the N_local == 1 case (joint attention must
still span devices) and disabled-3D sites (which must stay local).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from prometheus_tpu.models import MVLDMModel
from prometheus_tpu.ops.schedulers import make_schedule
from prometheus_tpu.systems import MVLDMSystem
from prometheus_tpu.utils import get_random_cameras


def _small_system(key, B=1, N=4, hw=8):
    mv_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32)
    cams = jnp.stack([get_random_cameras(jax.random.fold_in(key, b), N,
                                         size=4 * hw) for b in range(B)])
    params = mv_model.init(
        key, jnp.zeros((B, N, 3, 4 * hw, 4 * hw)),
        jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, hw, hw)), jnp.zeros((B, 77, 64)),
        jnp.zeros((B, N)), cams, method=MVLDMModel.init_everything)
    system = MVLDMSystem(model=mv_model,
                         schedule=make_schedule("vprediction"),
                         num_pred_views=N)
    txt = jax.random.normal(jax.random.fold_in(key, 7), (B, 77, 64)) * 0.02
    return system, params, cams, txt


@pytest.mark.parametrize("n_shards", [2, 4])
def test_view_sharded_matches_single_program(key, n_shards):
    N = 4
    system, params, cams, txt = _small_system(key, N=N, hw=8)
    ref = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                        num_inference_steps=3, guidance_type="joint",
                        guidance_scale=5.0, cfg_rescale=0.7, latent_hw=8)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("data",))
    out = system.sample_view_sharded(
        mesh, params, key, cams, txt, jnp.zeros_like(txt),
        num_inference_steps=3, guidance_type="joint", guidance_scale=5.0,
        cfg_rescale=0.7, latent_hw=8)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_view_sharded_one_view_per_device(key):
    """N_local == 1: the 3D sites must still attend across devices (the
    f > 1 flattening shortcut alone would silently degrade to 2D)."""
    N = 8
    system, params, cams, txt = _small_system(key, N=N, hw=8)
    ref = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                        num_inference_steps=2, guidance_type="text",
                        guidance_scale=3.0, cfg_rescale=0.0, latent_hw=8)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    out = system.sample_view_sharded(
        mesh, params, key, cams, txt, jnp.zeros_like(txt),
        num_inference_steps=2, guidance_type="text", guidance_scale=3.0,
        cfg_rescale=0.0, latent_hw=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_generate_view_sharded_end_to_end(key):
    """pipeline.generate(view_shard_mesh=...) == generate(): the sharded
    sampler, the view-sharded GS decode (cross-view DiT K/V gathers + the
    global-view position-table offset), the gaussian all-gather, and the
    per-device render must reproduce the single-program pipeline."""
    from prometheus_tpu.models import GSDecoderModel, TrajDiTModel
    from prometheus_tpu.pipeline import PrometheusPipeline
    from prometheus_tpu.systems import TrajDiTSystem

    system, params, cams, txt = _small_system(key, N=4, hw=8)
    B, N, hw = 1, 4, 8
    traj_model = TrajDiTModel(hidden_size=32, num_blocks=1, num_heads=4,
                              text_dim=64)
    traj_params = traj_model.init(
        key, jnp.zeros((1, 29, 11)), jnp.zeros((1, 77, 64)), jnp.zeros((1,)))
    gsdec = GSDecoderModel(dit_hidden_size=32, dit_depth=1, dit_num_heads=4,
                           vae_ch=16, vae_ch_mult=(1, 2), max_num_images=4)
    gsdec_vars = gsdec.init(key, jnp.zeros((B, N, 14, hw, hw)))
    pipe = PrometheusPipeline(
        mvldm=system, mvldm_params=params,
        traj=TrajDiTSystem(model=traj_model), traj_params=traj_params,
        gsdecoder=gsdec, gsdecoder_vars=gsdec_vars,
        gs_kwargs=dict(z_near=0.1, z_far=10.0))

    kw = dict(num_views=N, num_inference_steps=2, cameras=cams,
              render_size=32, image_size=32, latent_hw=hw,
              guidance_scale=3.0, cfg_rescale=0.7)
    ref = pipe.generate("a red cube", key, **kw)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    out = pipe.generate("a red cube", key, view_shard_mesh=mesh, **kw)

    np.testing.assert_allclose(np.asarray(out["latents_pred"]),
                               np.asarray(ref["latents_pred"]),
                               rtol=2e-4, atol=2e-4)
    for ga, gb in zip(out["gaussians"], ref["gaussians"]):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["images_gs_render"]),
                               np.asarray(ref["images_gs_render"]),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["images_pred"]),
                               np.asarray(ref["images_pred"]),
                               rtol=1e-3, atol=2e-3)


def test_view_sharded_train_loss_and_grads_match(key):
    """SP TRAINING: multi_view_loss_view_sharded must reproduce the
    single-program loss AND its parameter gradients (the K/V all-gathers'
    autodiff transposes are reduce-scatters) — including the view_cond
    reference-mask slicing across shards. Deterministic seams: pre-drawn
    noise, posterior mode, dropout p=0."""
    N, hw = 4, 8
    system, params, cams, txt = _small_system(key, N=N, hw=hw)
    k1, k2, k3 = jax.random.split(key, 3)
    batch = {
        "images_mv": jax.random.uniform(k1, (1, N, 3, 4 * hw, 4 * hw),
                                        minval=-1, maxval=1),
        "cameras_mv": cams,
        "depths_mv": jax.random.uniform(k2, (1, N, 1, 4 * hw, 4 * hw)),
        "text_emb": txt,
        "uncond_text_emb": jnp.zeros_like(txt),
    }
    lat_hw = 2 * hw  # 32^2 images / vae stride 2
    noise = jax.random.normal(k3, (1, N, 8, lat_hw, lat_hw))
    kw = dict(num_ref_views=1, drop_pose_p=0.0, drop_text_p=0.0,
              noise=noise, sample_posterior=False)

    def loss_single(p):
        return system.multi_view_loss(p, key, batch, **kw)[0]

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))

    def loss_sharded(p):
        return system.multi_view_loss_view_sharded(
            mesh, p, key, batch, axis="data", **kw)[0]

    l1, g1 = jax.value_and_grad(loss_single)(params)
    l2, g2 = jax.value_and_grad(loss_sharded)(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for path, a in flat1:
        b = flat2[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_orbit_video_frame_sharding_matches(key):
    """render_orbit_video(mesh=...) shards the T frames over the mesh
    (gaussians replicated) and must reproduce the chunked host loop."""
    from prometheus_tpu.pipeline import PrometheusPipeline

    B, P_ = 1, 64
    ks = jax.random.split(key, 5)
    gaussians = (
        jax.random.normal(ks[0], (B, P_, 3)) * 0.3,
        jax.random.uniform(ks[1], (B, P_, 1, 3)),
        jax.random.uniform(ks[2], (B, P_, 1), minval=0.2, maxval=0.9),
        jax.random.uniform(ks[3], (B, P_, 3), minval=0.01, maxval=0.1),
        jax.random.normal(ks[4], (B, P_, 4)),
    )
    dense = get_random_cameras(key, 6, size=32)[None]
    pipe = PrometheusPipeline.__new__(PrometheusPipeline)
    pipe.render_backend = "xla"
    ref = PrometheusPipeline.render_orbit_video(
        pipe, gaussians, dense, num_frames=8, size=32, chunk=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    out = PrometheusPipeline.render_orbit_video(
        pipe, gaussians, dense, num_frames=8, size=32, mesh=mesh)
    assert out.shape == ref.shape == (8, 3, 32, 32)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # frame counts that do NOT divide the device count stay sharded too
    # (padded with the last camera, sliced after the gather)
    ref7 = PrometheusPipeline.render_orbit_video(
        pipe, gaussians, dense, num_frames=7, size=32, chunk=4)
    out7 = PrometheusPipeline.render_orbit_video(
        pipe, gaussians, dense, num_frames=7, size=32, mesh=mesh)
    assert out7.shape == ref7.shape == (7, 3, 32, 32)
    np.testing.assert_allclose(out7, ref7, rtol=1e-4, atol=1e-4)


def test_view_sharded_indivisible_raises(key):
    system, params, cams, txt = _small_system(key, N=3, hw=8)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    with pytest.raises(ValueError, match="divisible"):
        system.sample_view_sharded(mesh, params, key, cams, txt,
                                   jnp.zeros_like(txt),
                                   num_inference_steps=2, latent_hw=8)
