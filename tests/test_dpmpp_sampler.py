"""DPM-Solver++(2M) sampler: step-math exactness + ODE-accuracy vs Euler.

The reference samples with 100 Euler steps
(``/root/reference/prometheus/systems/mv_ldm_system.py:920-1000``);
``sampler='dpmpp_2m'`` reaches the same probability-flow ODE solution in far
fewer steps. Accuracy here is a well-defined numerical-integration question
(independent of weight quality), so it is testable with random weights.
"""
import jax
import jax.numpy as jnp
import numpy as np

from prometheus_tpu.models import MVLDMModel
from prometheus_tpu.ops.schedulers import make_schedule
from prometheus_tpu.systems import MVLDMSystem
from prometheus_tpu.utils import get_random_cameras


def test_dpmpp_step_exact_for_constant_x0():
    """With a constant x0 prediction the probability-flow ODE is linear and
    the exponential-integrator steps are EXACT at any step count; plain
    Euler is not. Iterate the raw step functions on a 2-step ladder."""
    sch = make_schedule("edm")
    c = jnp.asarray([[1.5, -2.0, 0.25]])
    key = jax.random.PRNGKey(0)
    sigmas = sch.inference_sigmas(4)[:4]  # [s0, s1, s2, s3] — stop BEFORE 0:
    # any method's final step to sigma=0 returns x0 exactly, which would
    # mask the intermediate discretization error being tested here
    x = sigmas[0] * jax.random.normal(key, c.shape) + c
    # exact solution of dx/ds = (x - c)/s from (x, s0) at s3
    exact = c + (sigmas[3] / sigmas[0]) * (x - c)

    xd, x0_prev, s_prev, has = x, jnp.zeros_like(x), sigmas[0], jnp.zeros(())
    for i in range(3):
        xd = sch.dpmpp_2m_step(xd, c, x0_prev, s_prev, sigmas[i],
                               sigmas[i + 1], has)
        x0_prev, s_prev, has = c, sigmas[i], jnp.ones(())
    np.testing.assert_allclose(np.asarray(xd), np.asarray(exact), rtol=2e-5,
                               atol=2e-5)
    # (Euler is also exact for constant x0 — the solution is linear in
    # sigma — so the order-2 advantage is asserted on the real denoiser in
    # test_dpmpp_beats_euler_at_coarse_steps instead.)


def _tiny_system(key, N=2, hw=8):
    mv_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32)
    cams = get_random_cameras(key, N, size=4 * hw)[None]
    params = mv_model.init(
        key, jnp.zeros((1, N, 3, 4 * hw, 4 * hw)),
        jnp.zeros((1, 77), jnp.int32),
        jnp.zeros((1, N, 9, hw, hw)), jnp.zeros((1, 77, 64)),
        jnp.zeros((1, N)), cams, method=MVLDMModel.init_everything)
    system = MVLDMSystem(model=mv_model,
                         schedule=make_schedule("vprediction"),
                         num_pred_views=N)
    txt = jax.random.normal(jax.random.fold_in(key, 7), (1, 77, 64)) * 0.02
    return system, params, cams, txt


def test_dpmpp_beats_euler_at_coarse_steps(key):
    """ODE accuracy on the real (tiny, random-weight) denoiser with the EDM
    Karras schedule: against a fine-step Euler reference solution,
    DPM-Solver++(2M) must beat Euler at every coarse step count (measured
    here: ~1.4-1.8x lower error, i.e. euler's accuracy at ~half the steps).

    On the v-pred ZERO-SNR table schedule with RANDOM weights the x0(lambda)
    trajectory is not smooth enough for the order-2 advantage to show (the
    multistep extrapolation assumption fails); trained weights are smooth —
    on-chip quality validation recorded in PARITY.md. The karras ladder is
    auto-selected for dpmpp (see Schedule.inference_sigmas)."""
    import dataclasses

    system, params, cams, txt = _tiny_system(key)
    system = dataclasses.replace(system, schedule=make_schedule("edm"))
    kw = dict(guidance_type="none", guidance_scale=1.0, cfg_rescale=0.0,
              latent_hw=8)
    gt = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                       num_inference_steps=128, **kw)
    for n in (8, 16):
        e = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                          num_inference_steps=n, **kw)
        d = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                          num_inference_steps=n, sampler="dpmpp_2m", **kw)
        err_e = float(jnp.abs(e - gt).mean())
        err_d = float(jnp.abs(d - gt).mean())
        assert np.isfinite(err_e) and np.isfinite(err_d)
        assert err_d < err_e, (n, err_d, err_e)


def test_dpmpp_converges_on_vpred_schedule(key):
    """Sanity on the flagship (v-pred zero-SNR) schedule: the dpmpp path is
    finite and its error vs a (very) fine Euler solution shrinks with steps.
    The reference solution needs ~512 Euler steps here — at 128 its own
    discretization error (~0.04) is the size of the gaps being measured."""
    system, params, cams, txt = _tiny_system(key)
    kw = dict(guidance_type="none", guidance_scale=1.0, cfg_rescale=0.0,
              latent_hw=8)
    gt = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                       num_inference_steps=512, **kw)
    errs = []
    for n in (8, 32):
        d = system.sample(params, key, cams, txt, jnp.zeros_like(txt),
                          num_inference_steps=n, sampler="dpmpp_2m", **kw)
        assert bool(jnp.isfinite(d).all())
        errs.append(float(jnp.abs(d - gt).mean()))
    assert errs[1] < errs[0], errs
