import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.ops.schedulers import (
    cfg_combine,
    cfg_rescale,
    make_ddim,
    make_schedule,
    rescale_zero_terminal_snr,
    make_betas,
    alphas_cumprod_from_betas,
)


def test_zero_snr_rescale_terminal():
    betas = make_betas(1000, kind="linear")
    ab = rescale_zero_terminal_snr(alphas_cumprod_from_betas(betas))
    assert ab[-1] == 2.0**-24
    # first alpha-bar preserved
    np.testing.assert_allclose(ab[0], alphas_cumprod_from_betas(betas)[0], rtol=1e-6)
    assert np.all(np.diff(ab) < 0)  # strictly decreasing


@pytest.mark.parametrize("kind", ["vprediction", "eprediction", "edm"])
def test_preconditioning_identities(kind):
    sch = make_schedule(kind)
    s = jnp.asarray([0.1, 1.0, 10.0])
    # EDM identity: c_skip^2 + c_out^2/sigma_data^2... for sigma_data=1:
    # boundary conditions c_skip(s)->1 as s->0
    assert float(sch.c_skip(jnp.asarray(1e-4))) > 0.999
    # x0 readout must invert x0_to_target exactly
    x_t = jnp.asarray(1.7)
    x0 = jnp.asarray(-0.3)
    for sv in [0.1, 1.0, 10.0]:
        sv = jnp.asarray(sv)
        tgt = sch.x0_to_target(x_t, x0, sv)
        back = sch.denoise_output_to_x0(x_t, tgt, sv)
        np.testing.assert_allclose(float(back), float(x0), rtol=1e-5)


def test_vpred_sigma_table_monotone():
    sch = make_schedule("vprediction")
    t = np.asarray(sch.train_sigmas)
    assert t.shape == (1000,)
    assert np.all(np.diff(t) > 0)  # ascending in time
    assert t[-1] > 1000  # zero-terminal-SNR: sigma_max = sqrt((1-2^-24)/2^-24) ~ 4096
    np.testing.assert_allclose(t[-1], np.sqrt((1 - 2**-24) / 2**-24), rtol=1e-4)


def test_inference_sigmas_shape_and_order():
    for kind, hn in [("vprediction", False), ("edm", False), ("edm", True)]:
        sch = make_schedule(kind, high_noise=hn)
        sig = np.asarray(sch.inference_sigmas(50))
        assert sig.shape == (51,)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig[:-1]) < 0)  # descending
    edm = make_schedule("edm")
    sig = np.asarray(edm.inference_sigmas(10))
    np.testing.assert_allclose(sig[0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(sig[-2], 0.002, rtol=1e-5)


def test_edm_highnoise_params():
    sch = make_schedule("edm", high_noise=True)
    assert sch.sigma_max == 10000.0 and sch.sigma_schedule == "exponential"
    assert sch.p_mean == 1.5 and sch.p_std == 2.0


def test_euler_step_reaches_x0_at_zero_sigma():
    sch = make_schedule("edm")
    x_t = jnp.asarray([5.0])
    x0 = jnp.asarray([1.0])
    out = sch.euler_step(x_t, x0, jnp.asarray(2.0), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-6)


def test_euler_sampling_converges_to_data(key):
    # 1-D toy: exact denoiser for a delta distribution at mu recovers mu
    sch = make_schedule("edm")
    mu = 0.7
    sig = sch.inference_sigmas(40)
    x = sig[0] * jax.random.normal(key, (16,))
    for i in range(40):
        x0_pred = jnp.full_like(x, mu)  # exact posterior mean for delta data
        x = sch.euler_step(x, x0_pred, sig[i], sig[i + 1])
    np.testing.assert_allclose(np.asarray(x), mu, atol=1e-4)


def test_train_sigma_sampling_statistics(key):
    sch = make_schedule("edm")
    s = sch.sample_train_sigmas(key, (20000,))
    logs = jnp.log(s)
    np.testing.assert_allclose(float(logs.mean()), -0.5, atol=0.05)
    np.testing.assert_allclose(float(logs.std()), 1.2, atol=0.05)


def test_ddim_roundtrip(key):
    dd = make_ddim()
    x0 = jax.random.normal(key, (4, 8))
    noise = jax.random.normal(jax.random.split(key)[0], (4, 8))
    t = jnp.asarray(500)
    x_t = dd.add_noise(x0, noise, t)
    # perfect x0 prediction: stepping to t_prev = -1 (alpha_bar=1) returns x0
    out = dd.step(x_t, x0, t, jnp.asarray(-1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def test_ddim_timesteps():
    dd = make_ddim()
    ts = np.asarray(dd.timesteps(100))
    assert ts.shape == (100,)
    assert ts[0] > ts[-1]
    assert np.all(np.diff(ts) == -10)


def test_cfg():
    u = jnp.zeros((2, 3))
    c = jnp.ones((2, 3))
    np.testing.assert_allclose(np.asarray(cfg_combine(u, c, 7.5)), 7.5, atol=1e-6)


def test_cfg_rescale_preserves_cond_std(key):
    cond = jax.random.normal(key, (2, 4, 8, 8))
    guided = 5.0 * cond  # inflated std
    out = cfg_rescale(guided, cond, rescale=1.0)
    np.testing.assert_allclose(
        float(jnp.std(out)), float(jnp.std(cond)), rtol=1e-4
    )
    # rescale=0 -> unchanged
    out0 = cfg_rescale(guided, cond, rescale=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(guided), atol=1e-6)
