"""The hoisted text-K/V path must equal recomputing K/V every step.

The sampler precomputes each cross-attention site's to_k/to_v projection of
the (constant) CFG-stacked text context once per sample() call and feeds it
through the 100-step scan (VERDICT r2 weak #5). This pins numerical equality
of `_guided_output` with and without the precomputed kv, for every guidance
variant, so a plumbing regression (wrong site, wrong CFG row order, stale
repeat over views) cannot pass silently.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.models import MVLDMModel
from prometheus_tpu.ops.schedulers import make_schedule
from prometheus_tpu.systems import MVLDMSystem
from prometheus_tpu.utils import get_random_cameras


@pytest.fixture(scope="module")
def tiny():
    key = jax.random.PRNGKey(7)
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
    txt = jax.random.normal(key, (B, 77, 64)) * 0.02
    utxt = jax.random.normal(jax.random.PRNGKey(8), (B, 77, 64)) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(9), (B, N, 8, hw, hw))
    pose, upose = system._pose_embeddings(cams, hw, hw)
    return system, params, x, txt, utxt, (pose, upose)


@pytest.mark.parametrize("gtype", ["none", "text", "pose", "joint", "hybrid"])
def test_guided_output_matches_without_hoist(tiny, gtype):
    system, params, x, txt, utxt, (pose, upose) = tiny
    N = x.shape[1]
    sigma = jnp.asarray(1.7)
    kv = system._text_kv_for_guidance(params, txt, utxt, gtype, N)
    assert kv  # at least one cross-attn site was hoisted
    out_hoisted = system._guided_output(
        params, x, sigma, txt, utxt, pose, upose,
        gtype, 7.5, 0.7, text_kv=kv)
    out_plain = system._guided_output(
        params, x, sigma, txt, utxt, pose, upose,
        gtype, 7.5, 0.7, text_kv=None)
    np.testing.assert_allclose(np.asarray(out_hoisted),
                               np.asarray(out_plain), rtol=2e-5, atol=2e-5)
