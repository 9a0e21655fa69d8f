"""GSDecoderModel (GS-VAE): RGB-D latents + Plucker rays -> pixel-aligned 3DGS.

Parity target: ``/root/reference/prometheus/models/gs_decoder.py``. The SD
VAE decoder is re-purposed to emit 14 gaussian channels per pixel: its
``conv_in`` consumes ``[latents 14ch, cross-view-DiT output 14ch]`` (the
reference pads the pretrained conv by extra*2+4 = 24 channels), ``conv_out``
emits 14 channels, and EMANorm normalizers sit after each non-final upsample
conv. The cross-view DiT mixes information across the N views at the latent
bottleneck; the frozen VAE encoder produces latents (scale 0.18215).

The converter/renderer are stateless ops (``ops.gaussian``), not modules.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gaussian import convert_gaussians, render_gaussians
from .ray_dit import CrossViewDiTWrapped
from .vae import AutoencoderKL

Dtype = Any

VAE_SCALE = 0.18215


class GSDecoderModel(nn.Module):
    """flax module holding the trainable networks of stage 1."""

    latent_channel: int = 4
    extra_latent_channel: int = 10   # depth latents 4 + raymap 6
    use_cross_view_dit: bool = True
    use_ema_norm: bool = True
    gaussian_channels_out: int = 14
    max_num_images: int = 8
    dit_hidden_size: int = 1152
    dit_depth: int = 16
    dit_num_heads: int = 16
    vae_ch: int = 128
    vae_ch_mult: tuple = (1, 2, 4, 4)
    dtype: Dtype = jnp.float32
    # view-sharded decode: see CrossViewDiT.view_axis. Params are identical
    # with or without it (clone shares checkpoints).
    view_axis: str | None = None

    def setup(self):
        lat_total = self.latent_channel + self.extra_latent_channel  # 14
        extra = (
            lat_total * 2 - self.latent_channel  # concat(latents, dit_out): 24
            if self.use_cross_view_dit
            else self.extra_latent_channel
        )
        self.vae = AutoencoderKL(
            embed_dim=self.latent_channel,
            ch=self.vae_ch,
            ch_mult=self.vae_ch_mult,
            decoder_extra_channels=extra,
            decoder_out_ch=self.gaussian_channels_out,
            use_ema_norm=self.use_ema_norm,
            dtype=self.dtype,
        )
        if self.use_cross_view_dit:
            self.cross_view_dit = CrossViewDiTWrapped(
                latent_channels=lat_total,
                hidden_size=self.dit_hidden_size,
                depth=self.dit_depth,
                num_heads=self.dit_num_heads,
                max_num_images=self.max_num_images,
                dtype=self.dtype,
                view_axis=self.view_axis,
            )

    def encode_image(self, images: jax.Array, key: jax.Array | None = None) -> jax.Array:
        """images (B, N, 3, H, W) in [-1,1] -> latents (B, N, 4, H/8, W/8)."""
        B, N = images.shape[:2]
        posterior = self.vae.encode(images.reshape((B * N,) + images.shape[2:]))
        z = posterior.mode() if key is None else posterior.sample(key)
        z = z * VAE_SCALE
        return z.reshape((B, N) + z.shape[1:])

    def decode_latent(self, latents: jax.Array, train: bool = False) -> jax.Array:
        """latents (B, N, 14, h, w) -> raw gaussian params (B, N, 14, 8h, 8w).

        Channel layout in: [rgb latent 4, depth latent 4, raymap 6].
        """
        B, N, C, h, w = latents.shape
        if self.use_cross_view_dit:
            refined = self.cross_view_dit(latents, t=1000.0)
            x = jnp.concatenate([latents, refined], axis=2)  # (B, N, 28, h, w)
            x = x.reshape(B * N, 2 * C, h, w)
            out = self.vae.decode(x[:, : self.latent_channel],
                                  extra_z=x[:, self.latent_channel:],
                                  post_conv=True, train=train)
        else:
            x = latents.reshape(B * N, C, h, w)
            out = self.vae.decode(x[:, : self.latent_channel] / VAE_SCALE,
                                  extra_z=x[:, self.latent_channel:],
                                  post_conv=True, train=train)
        return out.reshape((B, N) + out.shape[1:])

    def __call__(self, latents: jax.Array, train: bool = False) -> jax.Array:
        # flax requires a __call__ for init; decode is the canonical path.
        return self.decode_latent(latents, train=train)

    def init_everything(self, images: jax.Array, latents: jax.Array):
        """Touch encoder + decoder so ``init`` materializes all params
        (decode alone skips the frozen VAE encoder)."""
        _ = self.encode_image(images)
        return self.decode_latent(latents)


def decode_and_render(
    model: GSDecoderModel,
    variables,
    latents: jax.Array,       # (B, N_in, 14, h, w)
    decode_cameras: jax.Array,  # (B, N_in, 18) cameras of the input views
    render_cameras: jax.Array,  # (B, N_out, 18) views to render
    h: int = 256,
    w: int = 256,
    bg_color=None,
    gs_kwargs: dict | None = None,
    train: bool = False,
):
    """Convenience functional pipeline: latents -> gaussians -> renders.

    Returns ``(images (B,N_out,3,h,w) in [-1,1], depths, masks, gaussians)``.
    """
    gs_kwargs = dict(gs_kwargs or {})
    mode = gs_kwargs.pop("mode", "mvsplat")
    out = model.apply(
        variables, latents, train=train,
        method=GSDecoderModel.decode_latent,
        mutable=["batch_stats"] if train else False,
    )
    raw, new_state = out if train else (out, {})
    gaussians = convert_gaussians(raw, decode_cameras, mode=mode, **gs_kwargs)
    images, depths, masks = render_gaussians(
        render_cameras, gaussians, h=h, w=w, bg_color=bg_color
    )
    return images, depths, masks, gaussians, new_state
