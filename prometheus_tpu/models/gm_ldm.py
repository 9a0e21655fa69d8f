"""GMLDMModel: the legacy single-model Director3D-style variant.

Parity target: ``/root/reference/prometheus/models/gm_ldm.py`` (kept in the
reference for checkpoint compatibility; mostly commented out of its
registries). One latent diffusion model whose U-Net denoises RGB latents and
whose (gaussian-headed) VAE decoder directly emits pixel-aligned 3DGS — no
separate stage-1 GS-VAE; the converter runs in ``director3d`` activation mode.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gaussian import convert_gaussians
from .unet_mv import MultiViewUNet
from .vae import AutoencoderKL

Dtype = Any

VAE_SCALE = 0.18215


class GMLDMModel(nn.Module):
    latent_channel: int = 4
    extra_latent_channel: int = 6    # raymap only (no depth latents here)
    image_size: int = 256
    model_channels: int = 320
    context_dim: int = 1024
    gaussian_channels_out: int = 14
    use_checkpoint: bool = True
    channel_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    num_head_channels: int = 64
    vae_ch: int = 128
    vae_ch_mult: tuple = (1, 2, 4, 4)
    dtype: Dtype = jnp.float32

    def setup(self):
        io_ch = self.latent_channel + self.extra_latent_channel
        self.unet = MultiViewUNet(
            in_channels=io_ch, out_channels=io_ch,
            model_channels=self.model_channels,
            num_res_blocks=self.num_res_blocks,
            channel_mult=self.channel_mult,
            num_head_channels=self.num_head_channels,
            context_dim=self.context_dim,
            use_checkpoint=self.use_checkpoint, dtype=self.dtype,
        )
        # gaussian-headed VAE: decoder consumes latents + raymap, emits 14ch
        self.vae = AutoencoderKL(
            embed_dim=self.latent_channel, ch=self.vae_ch,
            ch_mult=self.vae_ch_mult,
            decoder_extra_channels=self.extra_latent_channel,
            decoder_out_ch=self.gaussian_channels_out, dtype=self.dtype,
        )

    def encode_image(self, images: jax.Array, key=None) -> jax.Array:
        B, N = images.shape[:2]
        post = self.vae.encode(images.reshape((B * N,) + images.shape[2:]))
        z = post.mode() if key is None else post.sample(key)
        return (z * VAE_SCALE).reshape((B, N) + z.shape[1:])

    def denoise(self, latents_noisy, text_embeddings, t, num_views=None):
        """latents_noisy (B,N,4+6,h,w) incl. raymap cond; returns 4-ch pred."""
        B, N = latents_noisy.shape[:2]
        ctx = jnp.repeat(text_embeddings[:, None], N, 1).reshape(
            (B * N,) + text_embeddings.shape[1:])
        out = self.unet(
            latents_noisy.reshape((B * N,) + latents_noisy.shape[2:]),
            t.reshape(B * N), ctx,
            num_frames=num_views if num_views is not None else N)
        return out.reshape(B, N, -1, *out.shape[2:])[:, :, : self.latent_channel]

    def decode_gaussians(self, latents, raymap, cameras):
        """RGB latents (B,N,4,h,w) + raymap (B,N,6,h,w) -> gaussian tuple
        (director3d activation mode)."""
        B, N = latents.shape[:2]
        z = latents.reshape((B * N,) + latents.shape[2:]) / VAE_SCALE
        extra = raymap.reshape((B * N,) + raymap.shape[2:])
        raw = self.vae.decode(z, extra_z=extra)
        raw = raw.reshape((B, N) + raw.shape[1:])
        return convert_gaussians(raw, cameras, mode="director3d")

    def __call__(self, latents_noisy, text_embeddings, t):
        return self.denoise(latents_noisy, text_embeddings, t)

    def init_everything(self, images, latents_noisy, text_embeddings, t,
                        raymap, cameras):
        z = self.encode_image(images)
        _ = self.decode_gaussians(z, raymap, cameras)
        return self.denoise(latents_noisy, text_embeddings, t)
