"""Parity vs the reference's VENDORED EDM/Euler scheduler (VERDICT r2 #9).

``/root/reference/prometheus/modules/schedulers/edmscheduler_hacked.py`` is a
vendored diffusers ``EulerDiscreteScheduler`` with a syntactically broken
import (line 29 ends ``from diffusers.configuration_utils import``) and
diffusers-relative imports. It cannot be imported as-is; this test loads its
SOURCE with the import lines dropped and minimal faithful stubs for the five
diffusers symbols it uses (ConfigMixin/register_to_config/BaseOutput/
randn_tensor/SchedulerMixin) — running the reference's own math, not a
re-implementation — then checks our ``ops/schedulers.py`` v-pred regime
against it: training sigma table (zero-terminal-SNR rescale), inference
sigma ladder, ``scale_model_input`` (= c_in), one Euler ``step``, and the
``add_noise``/``get_velocity`` training pair.
"""
from __future__ import annotations

import functools
import inspect
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

VENDORED = ("/root/reference/prometheus/modules/schedulers/"
            "edmscheduler_hacked.py")


def load_vendored():
    src = open(VENDORED).read()
    kept = []
    for ln in src.split("\n"):
        s = ln.strip()
        # drop the package-relative and diffusers imports (one of which is
        # the broken ``from diffusers.configuration_utils import``)
        if s.startswith(("from .", "from diffusers")):
            continue
        kept.append(ln)
    src = "\n".join(kept)

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = types.SimpleNamespace(**cfg)
            init(self, *args, **kwargs)
        return wrapper

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(list(shape), generator=generator, dtype=dtype)

    import sys

    mod = types.ModuleType("edmscheduler_hacked_shimmed")
    # @dataclass resolves type hints via sys.modules[cls.__module__]
    sys.modules[mod.__name__] = mod
    mod.__dict__.update(
        ConfigMixin=type("ConfigMixin", (), {}),
        SchedulerMixin=type("SchedulerMixin", (), {}),
        BaseOutput=type("BaseOutput", (), {}),
        KarrasDiffusionSchedulers=[],
        register_to_config=register_to_config,
        randn_tensor=randn_tensor,
        logging=types.SimpleNamespace(get_logger=lambda *a, **k: None),
        # the vendored file's own ``logger = logging.get_logger`` line is
        # commented out (line 30) but step() still references it
        logger=types.SimpleNamespace(
            warning=lambda *a, **k: None, info=lambda *a, **k: None),
    )
    exec(compile(src, VENDORED, "exec"), mod.__dict__)
    return mod


@pytest.fixture(scope="module")
def vendored():
    return load_vendored()


def make_pair(vendored, num_inference_steps=None):
    """Vendored scheduler + our schedule at the reference's v-pred config
    (base_system.py:234-247: linear betas .00085-.012, zero-SNR, linspace,
    steps_offset 1)."""
    from prometheus_tpu.ops.schedulers import make_schedule

    sch = vendored.EulerDiscreteScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="linear",
        prediction_type="v_prediction", steps_offset=1,
        rescale_betas_zero_snr=True, timestep_spacing="linspace")
    if num_inference_steps:
        sch.set_timesteps(num_inference_steps)
    ours = make_schedule("vprediction")
    return sch, ours


def test_train_sigma_table(vendored):
    sch, ours = make_pair(vendored)
    # base_system.py:252: timesteps_to_sigmas = flip(sigmas[:-1])
    ref_table = torch.flip(sch.sigmas[:-1], dims=[0]).numpy()
    got = np.asarray(ours.train_sigmas)
    assert got.shape == ref_table.shape == (1000,)
    np.testing.assert_allclose(got, ref_table, rtol=5e-5)


def test_inference_sigma_ladder(vendored):
    for n in (10, 50, 100):
        sch, ours = make_pair(vendored, num_inference_steps=n)
        ref = sch.sigmas.numpy()             # descending, trailing 0
        got = np.asarray(ours.inference_sigmas(n))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=1e-6)


def test_scale_model_input_is_c_in(vendored):
    sch, ours = make_pair(vendored, num_inference_steps=25)
    x = torch.randn(2, 4, 8, 8, generator=torch.Generator().manual_seed(0))
    t = sch.timesteps[3]
    ref = sch.scale_model_input(x.clone(), t).numpy()
    sigma = float(sch.sigmas[3])
    got = np.asarray(x.numpy() * np.float32(
        np.asarray(ours.c_in(jnp.float32(sigma)))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_euler_step(vendored):
    sch, ours = make_pair(vendored, num_inference_steps=25)
    g = torch.Generator().manual_seed(1)
    x = torch.randn(1, 4, 8, 8, generator=g) * float(sch.init_noise_sigma)
    out = torch.randn(1, 4, 8, 8, generator=g)
    i = 5
    t = sch.timesteps[i].float()   # int timesteps are rejected by step()
    sch._step_index = i
    prev = sch.step(out.clone(), t, x.clone()).prev_sample.numpy()

    sigma = jnp.float32(float(sch.sigmas[i]))
    sigma_next = jnp.float32(float(sch.sigmas[i + 1]))
    x0 = ours.denoise_output_to_x0(jnp.asarray(x.numpy()),
                                   jnp.asarray(out.numpy()), sigma)
    got = np.asarray(ours.euler_step(jnp.asarray(x.numpy()), x0, sigma,
                                     sigma_next))
    np.testing.assert_allclose(got, prev, rtol=2e-4, atol=2e-5)


def test_add_noise_and_velocity_target(vendored):
    """Vendored add_noise is sigma-VE (``x0 + noise * sigma``,
    edmscheduler_hacked.py:633) — identical to ours for the matching sigma;
    get_velocity (VP-parameterized v target) must equal our ``x0_to_target``
    on the corresponding VE state."""
    sch, ours = make_pair(vendored)
    g = torch.Generator().manual_seed(2)
    x0 = torch.randn(2, 4, 8, 8, generator=g)
    noise = torch.randn(2, 4, 8, 8, generator=g)
    idx = torch.tensor([100, 800])
    t = sch.timesteps[idx].float()    # timestep VALUES (descending table)

    noisy_ref = sch.add_noise(x0.clone(), noise.clone(), t).numpy()
    v_vendored = sch.get_velocity(x0.clone(), noise.clone(), t).numpy()

    t_int = np.round(t.numpy()).astype(np.int64)
    sigma = np.asarray(ours.train_sigmas)[t_int][:, None, None, None]
    x_ve = np.asarray(ours.add_noise(
        jnp.asarray(x0.numpy()), jnp.asarray(noise.numpy()),
        jnp.asarray(sigma)))
    np.testing.assert_allclose(x_ve, noisy_ref, rtol=2e-4, atol=2e-5)

    # our training target equals the CONSISTENT v for sigma(t):
    # v = sqrt(ab) n - sqrt(1-ab) x0 with ab = 1/(1+sigma^2)
    ab = 1.0 / (1.0 + sigma**2)
    v_consistent = np.sqrt(ab) * noise.numpy() - np.sqrt(1 - ab) * x0.numpy()
    tgt = np.asarray(ours.x0_to_target(
        jnp.asarray(x_ve), jnp.asarray(x0.numpy()),
        jnp.asarray(sigma)))
    np.testing.assert_allclose(tgt, v_consistent, rtol=2e-4, atol=3e-5)

    # FINDING (recorded per VERDICT r2 #9): the vendored get_velocity
    # (edmscheduler_hacked.py:636-671) indexes alphas_cumprod by the
    # POSITION in the descending timestep table (999 - t) while its own
    # add_noise uses the correctly mirrored sigma — an internal
    # inconsistency in the vendored copy (it is dead code in the reference;
    # the systems build their targets from the EasyDict closures,
    # base_system.py:220-232). Verify the discrepancy is exactly that:
    ab_mirror = np.asarray(
        sch.alphas_cumprod.numpy())[999 - t_int][:, None, None, None]
    v_mirror = (np.sqrt(ab_mirror) * noise.numpy()
                - np.sqrt(1 - ab_mirror) * x0.numpy())
    np.testing.assert_allclose(v_vendored, v_mirror, rtol=2e-4, atol=3e-5)
