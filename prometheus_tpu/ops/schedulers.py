"""Diffusion noise schedules as pure functions (EDM formulation throughout).

From-scratch JAX implementation of the four training/sampling regimes the
reference builds from diffusers schedulers
(``/root/reference/prometheus/systems/base_system.py:171-333``):

- ``vprediction``: EulerDiscrete semantics — linear betas 0.00085..0.012 over
  1000 steps, zero-terminal-SNR rescale (Lin et al., with the
  ``alpha_bar[-1] = 2^-24`` guard), sigma(t) tables, v-pred preconditioning
  closures, linspace timestep spacing at inference.
- ``eprediction``: same sigma table from scaled-linear betas with
  epsilon-pred preconditioning.
- ``edm``: Karras sigma schedule (rho 7, sigma in [0.002, 80]) or the CAT3D
  high-noise variant (exponential schedule, sigma_max 10000, lognormal
  (1.5, 2.0) training sigmas).
- ``ddim``: alpha-bar formulation for the TrajDiT sample-prediction sampler.

All regimes share the sigma-parameterized API: ``x_t = x0 + sigma * eps``
(variance-exploding view; callers apply ``c_in`` before the network).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Beta-schedule machinery
# ---------------------------------------------------------------------------

def make_betas(num_steps: int = 1000, beta_start: float = 0.00085,
               beta_end: float = 0.012, kind: str = "linear") -> np.ndarray:
    if kind == "linear":
        return np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    if kind == "scaled_linear":
        return np.linspace(beta_start**0.5, beta_end**0.5, num_steps,
                           dtype=np.float64) ** 2
    raise ValueError(kind)


def alphas_cumprod_from_betas(betas: np.ndarray) -> np.ndarray:
    return np.cumprod(1.0 - betas)


def rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift+scale sqrt(alpha_bar) so the terminal SNR is exactly zero, then
    clamp the last entry to 2^-24 (the diffusers guard against inf sigma)."""
    ab_sqrt = np.sqrt(alphas_cumprod)
    a0, aT = ab_sqrt[0], ab_sqrt[-1]
    ab_sqrt = (ab_sqrt - aT) * a0 / (a0 - aT)
    out = ab_sqrt**2
    out[-1] = 2.0**-24
    return out


def sigmas_from_alphas_cumprod(alphas_cumprod: np.ndarray) -> np.ndarray:
    """sigma_t = sqrt((1 - abar_t) / abar_t), ascending in t."""
    return np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Schedule:
    """A sigma-parameterized diffusion schedule with preconditioning closures.

    ``c_skip/c_out/c_in/c_noise/loss_weight`` follow the EDM table; the
    denoiser is ``x0_pred = c_skip * x_t + c_out * F(c_in * x_t, c_noise)``.
    """

    kind: str
    num_train_timesteps: int
    prediction_type: str                       # 'epsilon' | 'v_prediction' | 'sample'
    c_skip: Callable
    c_out: Callable
    c_in: Callable
    c_noise: Callable
    loss_weight: Callable
    train_sigmas: jax.Array | None = None      # sigma(t) table, ascending in t (beta schedules)
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    sigma_schedule: str = "karras"             # 'karras' | 'exponential'
    p_mean: float = -0.5
    p_std: float = 1.2
    sigma_data: float = 1.0

    # -- training ----------------------------------------------------------
    def sample_train_sigmas(self, key: jax.Array, shape) -> jax.Array:
        """Per-element training noise levels."""
        if self.train_sigmas is not None:
            t = jax.random.randint(key, shape, 0, self.num_train_timesteps)
            return self.train_sigmas[t]
        # EDM lognormal
        return jnp.exp(self.p_mean + self.p_std * jax.random.normal(key, shape))

    def add_noise(self, x0: jax.Array, noise: jax.Array, sigma) -> jax.Array:
        """Variance-exploding noising; apply c_in before feeding the net."""
        return x0 + sigma * noise

    def denoise_output_to_x0(self, x_t, model_out, sigma):
        return self.c_skip(sigma) * x_t + self.c_out(sigma) * model_out

    def x0_to_target(self, x_t, x0, sigma):
        """Network regression target for x0 (inverse of the x0 readout)."""
        return (x0 - self.c_skip(sigma) * x_t) / self.c_out(sigma)

    # -- sampling ----------------------------------------------------------
    def inference_sigmas(self, num_steps: int,
                         ladder: str = "default") -> jax.Array:
        """Descending sigma ladder with a trailing 0 (num_steps + 1 entries).

        ``ladder='karras'`` forces rho-7 Karras spacing over the schedule's
        sigma range even for table (beta) schedules — multistep solvers
        (dpmpp_2m) need the smooth log-sigma spacing; the reference's
        linspace-in-timestep ladder has wildly uneven lambda steps near the
        zero-SNR end and degrades them below Euler."""
        if self.train_sigmas is not None and ladder != "karras":
            # linspace timestep spacing over the training table
            n = self.num_train_timesteps
            ts = np.linspace(0, n - 1, num_steps)[::-1].copy()
            table = np.asarray(self.train_sigmas)
            sig = np.interp(ts, np.arange(n), table)
            return jnp.asarray(np.concatenate([sig, [0.0]]), jnp.float32)
        if self.train_sigmas is not None:
            lo = float(np.asarray(self.train_sigmas)[0])
            hi = float(np.asarray(self.train_sigmas)[-1])
            i = np.linspace(0, 1, num_steps)
            inv_rho = 1.0 / self.rho
            sig = (hi**inv_rho + i * (lo**inv_rho - hi**inv_rho)) ** self.rho
            return jnp.asarray(np.concatenate([sig, [0.0]]), jnp.float32)
        if self.sigma_schedule == "karras":
            i = np.linspace(0, 1, num_steps)
            inv_rho = 1.0 / self.rho
            sig = (self.sigma_max**inv_rho
                   + i * (self.sigma_min**inv_rho - self.sigma_max**inv_rho)) ** self.rho
        elif self.sigma_schedule == "exponential":
            sig = np.exp(np.linspace(np.log(self.sigma_max),
                                     np.log(self.sigma_min), num_steps))
        else:
            raise ValueError(self.sigma_schedule)
        return jnp.asarray(np.concatenate([sig, [0.0]]), jnp.float32)

    def euler_step(self, x_t, x0_pred, sigma, sigma_next):
        """First-order (Euler) ODE step in sigma space."""
        d = (x_t - x0_pred) / sigma
        return x_t + (sigma_next - sigma) * d

    def dpmpp_2m_step(self, x_t, x0_pred, x0_prev, sigma_prev, sigma,
                      sigma_next, has_prev):
        """One DPM-Solver++(2M) multistep update (data-prediction form, Lu et
        al. 2022) in the VE parameterization ``x = x0 + sigma*eps``,
        ``lambda = -log sigma`` — a second-order exponential integrator that
        reaches Euler-at-100-steps ODE accuracy in ~1/3 the model evals.

        ``x0_prev``/``sigma_prev`` come from the previous step;
        ``has_prev`` (0/1) selects the first-order warm-up step (which is the
        exact-for-constant-x0 DDIM step: ``x0 + (s_n/s)(x - x0)``).
        ``sigma_next == 0`` (the ladder's trailing entry) returns
        ``x0``-extrapolation exactly."""
        sn = jnp.maximum(sigma_next, 1e-20)
        h = jnp.log(sigma) - jnp.log(sn)               # t_next - t > 0
        h_last = jnp.log(jnp.maximum(sigma_prev, 1e-20)) - jnp.log(sigma)
        r = jnp.maximum(h_last / h, 1e-6)
        d2 = (1.0 + 1.0 / (2.0 * r)) * x0_pred \
            - (1.0 / (2.0 * r)) * x0_prev
        d = jnp.where(has_prev > 0.5, d2, x0_pred)
        return (sigma_next / sigma) * x_t - jnp.expm1(-h) * d


def make_schedule(kind: str = "edm", *, high_noise: bool = False,
                  sigma_data: float = 1.0, num_train_timesteps: int = 1000) -> Schedule:
    """Factory for the four reference regimes (see module docstring)."""
    if kind in ("vprediction", "eprediction"):
        beta_kind = "linear" if kind == "vprediction" else "scaled_linear"
        betas = make_betas(num_train_timesteps, kind=beta_kind)
        ab = rescale_zero_terminal_snr(alphas_cumprod_from_betas(betas))
        table = jnp.asarray(sigmas_from_alphas_cumprod(ab), jnp.float32)
        if kind == "vprediction":
            c_out = lambda s: -s / jnp.sqrt(s**2 + 1)
        else:
            c_out = lambda s: s / jnp.sqrt(s**2 + 1)
        return Schedule(
            kind=kind,
            num_train_timesteps=num_train_timesteps,
            prediction_type="v_prediction" if kind == "vprediction" else "epsilon",
            c_skip=lambda s: 1.0 / (s**2 + 1),
            c_out=c_out,
            c_in=lambda s: 1.0 / jnp.sqrt(s**2 + 1),
            c_noise=lambda s: jnp.log(s) / 4.0,
            loss_weight=lambda s: (s**2 + 1) / s**2,
            train_sigmas=table,
        )
    if kind == "edm":
        sd = sigma_data
        common = dict(
            kind="edm",
            num_train_timesteps=num_train_timesteps,
            prediction_type="epsilon",
            c_skip=lambda s: sd**2 / (s**2 + sd**2),
            c_out=lambda s: s * sd / jnp.sqrt(s**2 + sd**2),
            c_in=lambda s: 1.0 / jnp.sqrt(s**2 + sd**2),
            c_noise=lambda s: jnp.log(s) / 4.0,
            loss_weight=lambda s: (s**2 + sd**2) / (s * sd) ** 2,
            sigma_data=sd,
        )
        if high_noise:  # CAT3D: logSNR shifted, exponential ladder
            return Schedule(**common, sigma_min=0.002, sigma_max=10000.0,
                            sigma_schedule="exponential", p_mean=1.5, p_std=2.0)
        return Schedule(**common, sigma_min=0.002, sigma_max=80.0,
                        sigma_schedule="karras", p_mean=-0.5, p_std=1.2)
    raise ValueError(f"unknown schedule kind: {kind}")


# ---------------------------------------------------------------------------
# DDIM (alpha-bar formulation; TrajDiT sample-prediction sampler)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    alphas_cumprod: jax.Array         # (N,) ascending t
    num_train_timesteps: int = 1000

    def timesteps(self, num_steps: int, steps_offset: int = 9) -> jax.Array:
        """Descending DDIM timesteps (diffusers leading-spacing + offset;
        the reference TrajDiT uses ``steps_offset=9``)."""
        n = self.num_train_timesteps
        step = n // num_steps
        ts = (np.arange(num_steps) * step)[::-1].copy() + steps_offset
        return jnp.asarray(np.clip(ts, 0, n - 1), jnp.int32)

    def add_noise(self, x0, noise, t):
        ab = self.alphas_cumprod[t]
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * noise

    def step(self, x_t, x0_pred, t, t_prev):
        """Deterministic (eta=0) DDIM update given a sample prediction."""
        ab_t = self.alphas_cumprod[t]
        ab_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        eps = (x_t - jnp.sqrt(ab_t) * x0_pred) / jnp.sqrt(1 - ab_t)
        return jnp.sqrt(ab_prev) * x0_pred + jnp.sqrt(1 - ab_prev) * eps


def make_ddim(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
              beta_end: float = 0.012, kind: str = "scaled_linear",
              zero_snr: bool = False) -> DDIMSchedule:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, kind)
    ab = alphas_cumprod_from_betas(betas)
    if zero_snr:
        ab = rescale_zero_terminal_snr(ab)
    return DDIMSchedule(jnp.asarray(ab, jnp.float32), num_train_timesteps)


# ---------------------------------------------------------------------------
# Classifier-free guidance
# ---------------------------------------------------------------------------

def cfg_combine(uncond: jax.Array, cond: jax.Array, scale: float) -> jax.Array:
    return uncond + scale * (cond - uncond)


def cfg_rescale(guided: jax.Array, cond: jax.Array, rescale: float = 0.7,
                axis=(1, 2, 3)) -> jax.Array:
    """Std-matching CFG rescale (Lin et al. 2023), reference
    ``mv_ldm_system.py:784-790``: blend the guided prediction towards one with
    the conditional prediction's per-sample std."""
    std_cond = jnp.std(cond, axis=axis, keepdims=True)
    std_guided = jnp.std(guided, axis=axis, keepdims=True)
    rescaled = guided * (std_cond / jnp.maximum(std_guided, 1e-8))
    return rescale * rescaled + (1.0 - rescale) * guided
