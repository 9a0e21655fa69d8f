"""GSDecoder (stage-1) system: GS-VAE reconstruction training + NVS inference.

Parity target: ``/root/reference/prometheus/systems/gs_decoder_system.py``.
The frozen VAE encoder embeds the input views (RGB + pseudo-depth); the
trainable decoder + cross-view DiT emit pixel-aligned gaussians; the NOVEL
views are rendered and supervised with MSE + (pluggable) LPIPS +
scale/shift-invariant disparity + opacity-entropy losses (the reference's
"Multiview loss (Novel view only)", gs_decoder_system.py:203-214).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..models.gs_decoder import GSDecoderModel
from ..ops.gaussian import convert_gaussians, render_gaussians
from ..utils.rays import raymap as make_raymap
from .depth_loss import scale_and_shift_invariant_loss


def psnr(pred: jax.Array, gt: jax.Array, data_range: float = 2.0) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-10))


@dataclasses.dataclass(eq=False)
class GSDecoderSystem:
    model: GSDecoderModel
    lpips_fn: Callable | None = None         # (pred, gt) -> scalar, in [-1,1]
    render_size: int = 256
    gs_kwargs: dict = dataclasses.field(
        default_factory=lambda: dict(z_near=0.01, z_far=100.0))
    render_bg_color: Any = None

    # -- shared forward -------------------------------------------------------
    def _decode(self, variables, params, images_in, depths_in, cameras_in,
                key, train: bool):
        """input views -> gaussians (+ new model state when training)."""
        v = {**variables, "params": params} if params is not None else variables
        B, n_in = images_in.shape[:2]
        depth3 = jnp.repeat(depths_in * 2.0 - 1.0, 3, axis=2)
        lat_rgb = self.model.apply(v, images_in, key,
                                   method=GSDecoderModel.encode_image)
        lat_depth = self.model.apply(v, depth3, key,
                                     method=GSDecoderModel.encode_image)
        lat_rgb = jax.lax.stop_gradient(lat_rgb)     # frozen encoder
        lat_depth = jax.lax.stop_gradient(lat_depth)
        h, w = lat_rgb.shape[-2:]
        rm = make_raymap(cameras_in, h, w)
        latents_in = jnp.concatenate([lat_rgb, lat_depth, rm], axis=2)
        out = self.model.apply(
            v, latents_in, train=train, method=GSDecoderModel.decode_latent,
            mutable=["batch_stats"] if train else False)
        raw, new_state = out if train else (out, {})
        gaussians = convert_gaussians(raw, cameras_in, **self.gs_kwargs)
        return gaussians, new_state

    # -- training loss --------------------------------------------------------
    def loss(
        self,
        params,
        model_state: dict,
        batch: dict,
        key: jax.Array,
        *,
        num_input_views: int = 4,
        lambda_mse: float = 1.0,
        lambda_lpips: float = 0.5,
        lambda_depth: float = 0.5,
        lambda_entropy: float = 0.0,
        render_size: int | None = None,
    ):
        """batch: ``images_mv (B, Nin+Nnv, 3, H, W)``, ``cameras_mv``,
        ``depths_mv`` (pseudo-disparity [0,1]). Returns
        ``(loss, (metrics, new_model_state))`` — the train-step contract."""
        images, cameras, depths = (batch["images_mv"], batch["cameras_mv"],
                                   batch["depths_mv"])
        rs = render_size or self.render_size
        n_in = num_input_views
        variables = {"params": params, **model_state}
        gaussians, new_state = self._decode(
            variables, None, images[:, :n_in], depths[:, :n_in],
            cameras[:, :n_in], key, train=True)

        # render and supervise NOVEL views only (reference
        # gs_decoder_system.py:203-207 renders cameras[:, num_input_views:];
        # its comment: "Multiview loss (Novel view only)")
        imgs_nv, deps_nv, masks_nv = render_gaussians(
            cameras[:, n_in:], gaussians, h=rs, w=rs,
            bg_color=self.render_bg_color)
        gt_nv = images[:, n_in:]
        gt_disp_nv = depths[:, n_in:]

        # NOTE: zero-lambda terms are skipped entirely — in JAX, 0 * NaN-grad
        # is still NaN, so multiplying by a zero weight does not protect you.
        loss = 0.0
        metrics = {"psnr_mv": psnr(imgs_nv, gt_nv)}
        loss_mse = jnp.mean((imgs_nv - gt_nv) ** 2)
        metrics["loss_mv_image_mse"] = loss_mse
        if lambda_mse:
            loss += lambda_mse * loss_mse
        if lambda_lpips and self.lpips_fn is not None:
            loss_lpips = self.lpips_fn(imgs_nv, gt_nv)
            metrics["loss_mv_image_lpips"] = loss_lpips
            loss += lambda_lpips * loss_lpips
        if lambda_depth:
            # render gives metric depth; supervise inverse vs disparity
            pred_disp = 1.0 / jnp.clip(deps_nv, 0.1, 100.0)
            valid = (deps_nv > 0.1).astype(jnp.float32)
            BN = pred_disp.shape[0] * pred_disp.shape[1]
            loss_depth = scale_and_shift_invariant_loss(
                pred_disp.reshape(BN, rs, rs),
                gt_disp_nv.reshape(BN, rs, rs),
                valid.reshape(BN, rs, rs))
            metrics["loss_mv_depth"] = loss_depth
            loss += lambda_depth * loss_depth
        if lambda_entropy:
            loss_entropy = jnp.mean(1.0 - masks_nv)
            metrics["loss_mv_entropy"] = loss_entropy
            loss += lambda_entropy * loss_entropy
        return loss, (metrics, new_state)

    # -- inference (stage-1 eval: images+cameras -> gaussians -> NVS) ---------
    def inference(self, variables, images_in, depths_in, cameras_in,
                  cameras_nv, key=None, render_size: int | None = None):
        rs = render_size or self.render_size
        if key is None:
            key = jax.random.PRNGKey(0)
        gaussians, _ = self._decode(variables, None, images_in, depths_in,
                                    cameras_in, key, train=False)
        imgs, deps, masks = render_gaussians(
            cameras_nv, gaussians, h=rs, w=rs, bg_color=self.render_bg_color)
        return {"gaussians": gaussians, "images_nv_pred": imgs,
                "depths_nv_pred": deps, "masks_nv_pred": masks}
