"""Training-loss tests: stage-1 GSDecoder, stage-2 MVLDM, depth loss, TrajDiT."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.models import GSDecoderModel, MVLDMModel, TrajDiTModel
from prometheus_tpu.ops.schedulers import make_schedule
from prometheus_tpu.parallel import init_train_state, make_optimizer, make_train_step
from prometheus_tpu.systems import GSDecoderSystem, MVLDMSystem, TrajDiTSystem
from prometheus_tpu.systems.depth_loss import (
    compute_scale_and_shift,
    scale_and_shift_invariant_loss,
)
from prometheus_tpu.utils import get_random_cameras


def test_scale_shift_solve_exact(rng):
    pred = jnp.asarray(rng.uniform(0.1, 1, size=(2, 8, 8)), jnp.float32)
    target = 2.5 * pred + 0.3
    mask = jnp.ones_like(pred)
    s, t = compute_scale_and_shift(pred, target, mask)
    np.testing.assert_allclose(np.asarray(s), 2.5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t), 0.3, atol=1e-4)
    # SSI loss of an affinely-related pair is ~0
    loss = scale_and_shift_invariant_loss(pred, target)
    assert float(loss) < 1e-6


def test_ssi_loss_invariance(rng):
    pred = jnp.asarray(rng.uniform(0.1, 1, size=(2, 16, 16)), jnp.float32)
    target = jnp.asarray(rng.uniform(0.1, 1, size=(2, 16, 16)), jnp.float32)
    l1 = scale_and_shift_invariant_loss(pred, target)
    l2 = scale_and_shift_invariant_loss(3.0 * pred - 1.0, target)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-3)


@pytest.fixture(scope="module")
def mv_setup():
    key = jax.random.PRNGKey(0)
    model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32,
    )
    B, N = 2, 2
    params = model.init(
        key, jnp.zeros((B, N, 3, 32, 32)), jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, 16, 16)), jnp.zeros((B, 77, 64)),
        jnp.zeros((B, N)), get_random_cameras(key, N, size=32)[None].repeat(B, 0),
        method=MVLDMModel.init_everything)
    system = MVLDMSystem(model=model, schedule=make_schedule("vprediction"),
                         num_pred_views=N)
    batch = {
        "images_mv": jax.random.uniform(key, (B, N, 3, 32, 32), minval=-1, maxval=1),
        "cameras_mv": get_random_cameras(key, N, size=32)[None].repeat(B, 0),
        "depths_mv": jax.random.uniform(key, (B, N, 1, 32, 32)),
        "text_emb": jax.random.normal(key, (B, 77, 64)),
        "uncond_text_emb": jnp.zeros((B, 77, 64)),
    }
    return system, params, batch


def test_mvldm_loss_finite_and_grads(mv_setup, key):
    system, params, batch = mv_setup

    def loss_fn(p):
        return system.multi_view_loss(p, key, batch)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert bool(jnp.isfinite(loss))
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    # UNet gets gradient; frozen targets mean VAE encoder gradient is zero
    unet_grads = grads["params"]["unet"]
    assert sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(unet_grads)) > 0
    vae_enc = grads["params"]["vae"]["encoder"]
    assert sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(vae_enc)) == 0


def test_mvldm_loss_ref_views_masked(mv_setup, key):
    system, params, batch = mv_setup
    loss, metrics = system.multi_view_loss(params, key, batch, num_ref_views=1)
    assert bool(jnp.isfinite(loss))


def test_mvldm_single_view_loss(mv_setup, key):
    system, params, batch = mv_setup
    B, M = 2, 2
    sv_batch = {
        "images_sv": batch["images_mv"],
        "depths_sv": batch["depths_mv"],
        "text_emb_sv": batch["text_emb"],
        "uncond_text_emb": batch["uncond_text_emb"],
    }
    cam = get_random_cameras(key, 1, size=32)[0]
    loss, metrics = system.single_view_loss(params, key, sv_batch, cam)
    assert bool(jnp.isfinite(loss))
    assert "sv_loss_mv_latent_mse" in metrics


@pytest.fixture(scope="module")
def gsdec_setup():
    key = jax.random.PRNGKey(1)
    model = GSDecoderModel(
        dit_hidden_size=32, dit_depth=1, dit_num_heads=4,
        vae_ch=32, vae_ch_mult=(1, 2), max_num_images=4,
    )
    B, n = 1, 4
    variables = model.init(key, jnp.zeros((B, 2, 3, 32, 32)),
                           jnp.zeros((B, 2, 14, 16, 16)),
                           method=GSDecoderModel.init_everything)
    system = GSDecoderSystem(model=model, render_size=32,
                             gs_kwargs=dict(z_near=0.1, z_far=10.0))
    cams = get_random_cameras(key, n, size=32)[None]
    batch = {
        "images_mv": jax.random.uniform(key, (B, n, 3, 32, 32), minval=-1, maxval=1),
        "cameras_mv": cams,
        "depths_mv": jax.random.uniform(key, (B, n, 1, 32, 32), minval=0.1, maxval=1.0),
    }
    return system, variables, batch


def test_gsdecoder_loss_and_train_step(gsdec_setup, key):
    system, variables, batch = gsdec_setup
    params = variables["params"]
    state0 = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, ms, b, k):
        return system.loss(p, ms, b, k, num_input_views=2, render_size=32,
                           lambda_entropy=0.01)

    loss, (metrics, new_state) = loss_fn(params, state0, batch, key)
    assert bool(jnp.isfinite(loss))
    assert "psnr_mv" in metrics and bool(jnp.isfinite(metrics["psnr_mv"]))

    # one optimizer step through the train-step factory
    tx = make_optimizer(learning_rate=1e-4)
    ts = init_train_state(params, state0, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    ts2, m = step(ts, batch, key)
    assert int(ts2.step) == 1
    assert bool(jnp.isfinite(m["loss"]))
    assert float(m["grad_norm"]) > 0
    # EMANorm batch_stats updated in-train
    bs_old = jax.tree.leaves(ts.model_state)
    bs_new = jax.tree.leaves(ts2.model_state)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(bs_old, bs_new))


def test_trajdit_training_loss(key):
    model = TrajDiTModel(hidden_size=32, num_blocks=1, num_heads=4)
    sys_ = TrajDiTSystem(model=model)
    cams = get_random_cameras(key, 29, size=256)[None]
    text = jax.random.normal(key, (1, 7, 1024))
    params = model.init(key, jnp.zeros((1, 29, 11)), text, jnp.zeros((1,)))
    loss = sys_.loss(params, key, cams, text)
    assert bool(jnp.isfinite(loss))
    g = jax.grad(lambda p: sys_.loss(p, key, cams, text))(params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
