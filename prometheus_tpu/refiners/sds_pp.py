"""SDS++ test-time 3DGS refiners (single-view SD guidance + multi-view MV-LDM).

Parity targets: ``/root/reference/prometheus/modules/refiners/sds_pp_refiner.py``
(single-view SDS++ with learnable "LoDS" negative embedding) and
``models/mv_sdspp_refiner.py`` (guidance from the trained MV-LDM itself).

TPU-first redesign: gaussians live in a fixed-capacity masked buffer
(``gs_manager``), the per-iteration update is one jitted step (render sampled
cameras -> encode -> noise -> guided noise-pred -> latent+image SDS losses ->
Adam on raw gaussian params + the learnable embedding), and densify/prune is
a separate jitted static-shape round every ``densification_interval`` steps.
The densification statistic is the accumulated parameter-gradient magnitude
of each gaussian's position (the screen-space-gradient analog available
through autodiff).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..ops.gaussian import render_gaussians
from ..ops.schedulers import make_ddim
from ..utils.cameras import sample_from_dense_cameras
from .gs_manager import GaussianBuffer, activate, densify_and_prune, make_buffer

def call_with_compile_retry(fn, *args, attempts: int = 3, wait: float = 30.0):
    """Invoke a jitted fn, retrying on transient backend-transport failures.

    Tunneled/remote TPU backends can drop the compile RPC ("UNAVAILABLE ...
    Broken pipe") on large programs late in a process's life while the
    device itself stays healthy; a backoff retry re-issues the compile.
    No-op overhead on the cached fast path.
    """
    for a in range(attempts):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if "UNAVAILABLE" not in str(e) or a == attempts - 1:
                raise
            time.sleep(wait * (a + 1))


DEFAULT_LRS = {
    "xyz": 1e-4, "feats_raw": 1e-2, "opacity_raw": 5e-2,
    "scales_raw": 5e-3, "rots_raw": 1e-3, "embedding": 1e-3,
}


@dataclasses.dataclass(eq=False)
class GSRefinerSDSPlusPlus:
    """Single-view SDS++ with an SD-2.1-class 2D U-Net as guidance.

    ``denoise_fn(latents (B,4,h,w), t (B,), text_emb (B,L,D)) -> eps`` wraps
    the guidance U-Net; ``encode_fn``/``decode_fn`` wrap the (frozen) VAE.

    ``frozen_params``: when set, the tower fns take this pytree as their
    FIRST argument (``encode_fn(params, images)`` etc.) and the weights flow
    through the jitted refine programs as runtime buffers. When ``None``
    (legacy closure form), jit embeds every closed-over weight as an inline
    constant in each program — the serialized remote-compile body then
    scales with model width (the tunneled backend rejects flagship-width
    bodies with HTTP 413) and each of the three per-iteration programs
    carries its own on-device copy of the same frozen weights. Pass
    ``frozen_params`` for anything bigger than a toy model.
    """

    denoise_fn: Callable
    encode_fn: Callable
    decode_fn: Callable
    frozen_params: Any = None
    guidance_scale: float = 7.5
    num_views: int = 4          # cameras sampled per iteration
    img_size: int = 256
    total_iterations: int = 300
    densification_interval: int = 100
    capacity_factor: float = 1.5
    min_step_ratio: float = 0.02
    max_step_ratio: float = 0.75
    use_lods: bool = True
    lambda_latent_sds: float = 1.0
    lambda_image_sds: float = 0.1
    lambda_mask_saturation: float = 0.0
    lambda_scale_reg: float = 10.0
    opacity_threshold: float = 0.01
    text_template: str = "$text$, 3D scene."
    negative_text_template: str = "blurry, low quality, distorted"
    lrs: dict = dataclasses.field(default_factory=lambda: dict(DEFAULT_LRS))

    def __post_init__(self):
        self.schedule = make_ddim(kind="scaled_linear")
        n = self.schedule.num_train_timesteps
        self.min_step = int(n * self.min_step_ratio)
        self.max_step = int(n * self.max_step_ratio)

    # two-arg (params-first) vs legacy closure tower calls ---------------
    def _enc(self, fp, images):
        return self.encode_fn(fp, images) if self.frozen_params is not None \
            else self.encode_fn(images)

    def _dec(self, fp, latents):
        return self.decode_fn(fp, latents) if self.frozen_params is not None \
            else self.decode_fn(latents)

    def _den(self, fp, latents, t, emb):
        return self.denoise_fn(fp, latents, t, emb) \
            if self.frozen_params is not None \
            else self.denoise_fn(latents, t, emb)

    # ------------------------------------------------------------------
    def _t_for_iter(self, i: jax.Array) -> jax.Array:
        """sqrt-annealed timestep from max_step down to min_step."""
        frac = jnp.sqrt(i / self.total_iterations)
        return (frac * (self.min_step - self.max_step)
                + self.max_step).astype(jnp.int32)

    def _make_optimizer(self):
        # params tree is ((xyz, feats, opacity, scales, rots), embedding) —
        # the bool alive mask is NOT a parameter (kept out of grad/adam).
        labels = (("xyz", "feats_raw", "opacity_raw", "scales_raw",
                   "rots_raw"), "embedding")
        transforms = {k: optax.adam(v) for k, v in self.lrs.items()}
        return optax.multi_transform(transforms, labels)

    # ------------------------------------------------------------------
    # The per-iteration math is split into two compile units:
    #   _guidance_targets — treats the renders as CONSTANTS (every tensor it
    #     produces is a stop-grad target): U-Net passes, CFG, x0/image
    #     predictions, and the LoDS embedding grad. Heavy, render-free.
    #   _pull_loss — the part differentiated through the rasterizer + VAE
    #     encode: re-encode the renders and pull them toward the targets.
    # One fused step (guidance + render VJP + optimizer in a single jit)
    # exceeded what the tunneled backend's remote_compile survives; the
    # split programs each compile in train-step-bench territory. Math is
    # unchanged: the U-Net outputs were stop-grad in the fused form too.
    # ------------------------------------------------------------------
    def _guidance_targets(self, fp, images, depths, cams, t, text_emb,
                          uncond_emb, learn_emb, key):
        """images/depths: rendered constants. Returns
        ``(targets dict, loss_embedding, grad_embedding)``."""
        latents = self._enc(fp, images)
        B = latents.shape[0]
        tb = jnp.broadcast_to(t, (B,))
        noise = jax.random.normal(key, latents.shape)
        ab = self.schedule.alphas_cumprod[tb][:, None, None, None]
        frozen_noisy = jnp.sqrt(ab) * latents + jnp.sqrt(1 - ab) * noise

        if self.use_lods:
            def emb_loss(emb):
                eps_l = self._den(
                    fp, frozen_noisy, tb,
                    jnp.broadcast_to(emb, (B,) + emb.shape[1:]))
                return jnp.mean((eps_l - noise) ** 2), eps_l

            (loss_embedding, eps_learn), grad_emb = jax.value_and_grad(
                emb_loss, has_aux=True)(learn_emb)
        else:
            eps_learn = noise
            loss_embedding = jnp.zeros(())
            grad_emb = jnp.zeros_like(learn_emb)

        eps = self._den(
            fp,
            jnp.concatenate([frozen_noisy, frozen_noisy], 0),
            jnp.concatenate([tb, tb], 0),
            jnp.concatenate([
                jnp.broadcast_to(text_emb, (B,) + text_emb.shape[1:]),
                jnp.broadcast_to(uncond_emb, (B,) + uncond_emb.shape[1:])], 0))
        eps_cond, eps_uncond = jnp.split(eps, 2, axis=0)
        eps_g = eps_uncond + self.guidance_scale * (eps_cond - eps_uncond)

        alpha = jnp.sqrt(ab)
        sigma = jnp.sqrt(1 - ab)
        w = (1 - self.schedule.alphas_cumprod[tb])[:, None, None, None]
        latents_pred = (frozen_noisy - sigma * (eps_g - eps_learn + noise)) \
            / alpha
        images_pred = jnp.clip(self._dec(fp, latents_pred), -1, 1)
        targets = {"latents_pred": latents_pred, "images_pred": images_pred,
                   "scale": (w * alpha / sigma)[:, 0, 0, 0]}
        return targets, loss_embedding, grad_emb

    def _pull_loss(self, fp, images, depths, targets):
        """Differentiable-through-render pull toward the guidance targets."""
        latents = self._enc(fp, images)
        B = latents.shape[0]
        scale = targets["scale"]
        loss_latent = jnp.sum(jnp.sum(
            (latents - targets["latents_pred"]) ** 2, axis=(1, 2, 3))
            * scale) / B
        loss_image = jnp.sum(jnp.sum(
            (images - targets["images_pred"]) ** 2, axis=(1, 2, 3))
            * scale) / B
        return (self.lambda_latent_sds * loss_latent
                + self.lambda_image_sds * loss_image)

    # ------------------------------------------------------------------
    def refine_gaussians(self, gaussians, text_emb, uncond_emb,
                         dense_cameras: jax.Array, key: jax.Array):
        """Refine a gaussian tuple; returns the refined (activated) tuple.

        ``text_emb``/``uncond_emb``: (1, L, D) prompt embeddings (templating
        happens at the text level in the caller).
        """
        n0 = gaussians[0].shape[1]
        capacity = int(n0 * self.capacity_factor)
        buf = make_buffer(gaussians, capacity)
        learn_emb = jnp.zeros_like(uncond_emb)

        def floats_of(b: GaussianBuffer):
            return (b.xyz, b.feats_raw, b.opacity_raw, b.scales_raw,
                    b.rots_raw)

        tx = self._make_optimizer()
        opt_state = tx.init((floats_of(buf), learn_emb))
        grad_stat = jnp.zeros(capacity)

        # three compile units instead of one monster program (see the
        # _guidance_targets docstring): render fwd -> guidance (U-Net) ->
        # render+encode VJP + optimizer. Costs one extra render forward per
        # iteration; each program compiles reliably at flagship size.
        # frozen tower weights enter `guidance`/`grad_and_update` as the
        # runtime argument `fp` (empty tuple in the legacy closure form) so
        # the serialized programs stay width-independent.
        fp = self.frozen_params if self.frozen_params is not None else ()

        @jax.jit
        def render_fwd(buf, i, key):
            k_cam, k_noise = jax.random.split(key)
            ts = jax.random.uniform(k_cam, (1, self.num_views))
            cams = sample_from_dense_cameras(dense_cameras[:1], ts)
            imgs, deps, masks = render_gaussians(
                cams, activate(buf), h=self.img_size, w=self.img_size)
            images = imgs.reshape((-1, 3, self.img_size, self.img_size))
            return images, deps, cams, self._t_for_iter(i), k_noise

        @jax.jit
        def guidance(fp, images, deps, cams, t, learn_emb, k_noise):
            return self._guidance_targets(fp, images, deps, cams, t, text_emb,
                                          uncond_emb, learn_emb, k_noise)

        @jax.jit
        def grad_and_update(fp, buf, learn_emb, opt_state, grad_stat, cams,
                            targets, grad_emb, loss_emb):
            alive = buf.alive

            def loss_fn(floats):
                b = GaussianBuffer(*floats, alive=alive)
                imgs, deps, masks = render_gaussians(
                    cams, activate(b), h=self.img_size, w=self.img_size)
                images = imgs.reshape((-1, 3, self.img_size, self.img_size))
                loss = self._pull_loss(fp, images, deps, targets)
                if self.lambda_mask_saturation > 0:
                    loss += self.lambda_mask_saturation * jnp.mean(
                        (masks - 1.0) ** 2)
                # big-gaussian regularizer
                scal = jnp.exp(b.scales_raw).max(-1)
                loss += self.lambda_scale_reg * jnp.sum(
                    jnp.where(b.alive & (scal > 0.1), scal, 0.0))
                return loss

            floats = floats_of(buf)
            loss, gfloats = jax.value_and_grad(loss_fn)(floats)
            params = (floats, learn_emb)
            grads = (gfloats, grad_emb)
            updates, opt_state = tx.update(grads, opt_state, params)
            (new_floats, learn_emb) = optax.apply_updates(params, updates)
            buf = GaussianBuffer(*new_floats, alive=alive)
            stat = grad_stat + jnp.linalg.norm(gfloats[0], axis=-1)
            return buf, learn_emb, opt_state, loss + loss_emb, stat

        densify = jax.jit(partial(
            densify_and_prune, opacity_prune=self.opacity_threshold))

        for i in range(self.total_iterations):
            key, k_i = jax.random.split(key)
            if i > 0 and i % self.densification_interval == 0:
                key, k_d = jax.random.split(key)
                buf = densify(buf, grad_stat / self.densification_interval,
                              k_d)
                grad_stat = jnp.zeros(capacity)
                opt_state = tx.init((floats_of(buf), learn_emb))  # reset moments
            images, deps, cams, t, k_noise = call_with_compile_retry(
                render_fwd, buf, jnp.asarray(i, jnp.float32), k_i)
            targets, loss_emb, grad_emb = call_with_compile_retry(
                guidance, fp, images, deps, cams, t, learn_emb, k_noise)
            buf, learn_emb, opt_state, loss, grad_stat = \
                call_with_compile_retry(
                    grad_and_update, fp, buf, learn_emb, opt_state, grad_stat,
                    cams, targets, grad_emb, loss_emb)
        return activate(buf)


@dataclasses.dataclass(eq=False)
class MultiviewSDSPPRefiner(GSRefinerSDSPlusPlus):
    """MV-SDS++: guidance is the trained MV-LDM itself (multi-view RGB-D SDS).

    Parity: ``/root/reference/prometheus/models/mv_sdspp_refiner.py`` — the
    sampled views are denoised JOINTLY (raymap-conditioned cross-view
    attention) in the 8-channel RGB-D latent space; the SDS pull is
    ``||latents - x0_pred||^2`` with 1/sigma^2 weighting. Buffer, annealing,
    and densification are inherited. ``use_lods`` is off (the MV model has no
    LoDS path in the reference either).
    """

    mvldm_system: Any = None     # MVLDMSystem
    mvldm_params: Any = None
    use_lods: bool = False

    def _encode_rgbd(self, fp, images, depths):
        """Renders -> joint (1, V, 8, h, h) RGB-D latents."""
        V = self.num_views
        depth3 = jnp.repeat(
            jnp.clip(depths, 0.0, 1.0).reshape(V, 1, self.img_size,
                                               self.img_size) * 2 - 1,
            3, axis=1)
        lat_rgb = self._enc(fp, images)
        lat_depth = self._enc(fp, depth3)
        hw = lat_rgb.shape[-1]
        return jnp.concatenate([lat_rgb, lat_depth], 1).reshape(
            1, V, 8, hw, hw)

    def _guidance_targets(self, fp, images, depths, cams, t, text_emb,
                          uncond_emb, learn_emb, key):
        sys_ = self.mvldm_system
        latents = self._encode_rgbd(fp, images, depths)
        hw = latents.shape[-1]

        sch = sys_.schedule
        sigma = sch.train_sigmas[t] if sch.train_sigmas is not None \
            else jnp.exp(sch.p_mean + sch.p_std)
        noise = jax.random.normal(key, latents.shape)
        noisy = latents + sigma * noise

        pose_emb, uncond_pose = sys_._pose_embeddings(cams, hw, hw)
        mv_params = fp if self.frozen_params is not None \
            else self.mvldm_params
        out = sys_._guided_output(
            mv_params, noisy, sigma, text_emb, uncond_emb,
            pose_emb, uncond_pose, "joint", self.guidance_scale, 0.0)
        x0 = sch.denoise_output_to_x0(noisy, out, sigma)
        targets = {"x0": x0, "w": 1.0 / (sigma**2 + 1.0)}
        return targets, jnp.zeros(()), jnp.zeros_like(learn_emb)

    def _pull_loss(self, fp, images, depths, targets):
        latents = self._encode_rgbd(fp, images, depths)
        loss_latent = jnp.sum(
            targets["w"] * (latents - targets["x0"]) ** 2) / self.num_views
        return self.lambda_latent_sds * loss_latent
