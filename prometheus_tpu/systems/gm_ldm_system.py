"""GM-LDM system: training/sampling for the legacy single-model variant.

Parity target: ``/root/reference/prometheus/systems/gm_ldm_system.py``
(Director3D-style path kept for checkpoint compatibility). The U-Net denoises
RGB latents conditioned on raymaps; the gaussian-headed VAE decoder turns x0
latents directly into 3DGS — no separate stage-1 decoder.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..models.gm_ldm import GMLDMModel
from ..ops.gaussian import render_gaussians
from ..ops.schedulers import Schedule, make_schedule
from ..utils.rays import raymap as make_raymap


@dataclasses.dataclass(eq=False)
class GMLDMSystem:
    model: GMLDMModel
    schedule: Schedule = dataclasses.field(
        default_factory=lambda: make_schedule("vprediction"))

    def loss(self, params, key: jax.Array, batch: dict,
             drop_text_p: float = 0.1):
        """Latent denoising MSE (RGB latents only — no depth channel here)."""
        images, cameras = batch["images_mv"], batch["cameras_mv"]
        B, N = images.shape[:2]
        k_enc, k_sig, k_noise, k_text = jax.random.split(key, 4)
        x0 = jax.lax.stop_gradient(
            self.model.apply(params, images, k_enc,
                             method=GMLDMModel.encode_image))
        h, w = x0.shape[-2:]
        sigmas = self.schedule.sample_train_sigmas(k_sig, (B,))
        sig = sigmas[:, None, None, None, None]
        noise = jax.random.normal(k_noise, x0.shape)
        noisy = x0 + sig * noise
        rm = make_raymap(cameras, h, w)
        net_in = jnp.concatenate([self.schedule.c_in(sig) * noisy, rm], 2)
        t_cond = jnp.broadcast_to(
            self.schedule.c_noise(sigmas)[:, None], (B, N))
        text_emb = batch["text_emb"]
        keep = jax.random.uniform(k_text, (B, 1, 1)) >= drop_text_p
        text_emb = jnp.where(keep, text_emb, batch["uncond_text_emb"])
        pred = self.model.apply(params, net_in, text_emb, t_cond,
                                method=GMLDMModel.denoise)
        x0_pred = self.schedule.c_skip(sig) * noisy + self.schedule.c_out(sig) * pred
        wgt = self.schedule.loss_weight(sig)
        loss = jnp.mean(wgt * (x0_pred - x0) ** 2)
        return loss, {"loss_gm_latent_mse": loss}

    @partial(jax.jit, static_argnames=("self", "num_inference_steps",
                                       "guidance_scale", "latent_hw",
                                       "render_size"))
    def sample(self, params, key, cameras, text_embeddings,
               uncond_text_embeddings, num_inference_steps: int = 50,
               guidance_scale: float = 7.5, latent_hw: int = 32,
               render_size: int = 256):
        """Text -> gaussians + renders through the single model."""
        B, N = cameras.shape[:2]
        h = w = latent_hw
        rm = make_raymap(cameras, h, w)
        sigmas = self.schedule.inference_sigmas(num_inference_steps)
        x = sigmas[0] * jax.random.normal(key, (B, N, 4, h, w))

        def body(x, i):
            sigma, sigma_next = sigmas[i], sigmas[i + 1]
            x_in = self.schedule.c_in(sigma) * x
            t = jnp.broadcast_to(self.schedule.c_noise(sigma), (B, N))
            stack = jnp.concatenate(
                [jnp.concatenate([x_in, rm], 2)] * 2, 0)
            txt = jnp.concatenate([text_embeddings, uncond_text_embeddings], 0)
            out = self.model.apply(params, stack, txt,
                                   jnp.concatenate([t, t], 0),
                                   method=GMLDMModel.denoise)
            cond, uncond = jnp.split(out, 2, 0)
            guided = uncond + guidance_scale * (cond - uncond)
            x0 = self.schedule.denoise_output_to_x0(x, guided, sigma)
            return self.schedule.euler_step(x, x0, sigma, sigma_next), x0

        x, x0s = jax.lax.scan(body, x, jnp.arange(num_inference_steps))
        latents = x0s[-1]
        gaussians = self.model.apply(params, latents, rm, cameras,
                                     method=GMLDMModel.decode_gaussians)
        imgs, deps, masks = render_gaussians(cameras, gaussians,
                                             h=render_size, w=render_size)
        return {"latents_pred": latents, "gaussians": gaussians,
                "images_gs_render": imgs, "depths_gs_render": deps}
