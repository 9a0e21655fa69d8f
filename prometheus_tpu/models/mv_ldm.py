"""MVLDMModel: the stage-2 multi-view RGB-D latent diffusion model.

Parity target: ``/root/reference/prometheus/models/mv_ldm.py``. Composes the
MultiViewUNet denoiser, the (frozen) SD VAE, and the CLIP text tower. The
``denoise`` path (reference ``mv_ldm.py:207-257``): per-view low-res Plucker
raymaps are concatenated onto the noisy RGB-D latents (channels last), text
embeddings are repeated per view, all views are flattened into the U-Net's
batch with ``num_frames=N`` for joint cross-view attention, and the first 8
output channels (RGB latent 4 + depth latent 4) are returned.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.rays import raymap as make_raymap
from .clip_text import CLIPTextModel
from .unet_mv import MultiViewUNet
from .vae import AutoencoderKL

Dtype = Any

VAE_SCALE = 0.18215


class MVLDMModel(nn.Module):
    latent_channel: int = 4
    extra_latent_channel: int = 11   # depth latent 4 + raymap 6 + view mask 1
    image_size: int = 256
    model_channels: int = 320
    context_dim: int = 1024
    disable_3d_attentions: tuple = (1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1)
    use_checkpoint: bool = True
    remat_policy: str = "full"    # see MultiViewUNet.remat_policy
    # reduced-size knobs for tests
    channel_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    num_head_channels: int = 64
    clip_layers: int = 23
    clip_width: int = 1024
    vae_ch: int = 128
    vae_ch_mult: tuple = (1, 2, 4, 4)
    dtype: Dtype = jnp.float32
    # view-sharded (sequence-parallel) inference: see MultiViewUNet.view_axis.
    # Params are identical with or without it, so a plain
    # ``dataclasses.replace(model, view_axis=...)`` clone shares checkpoints.
    view_axis: str | None = None

    @property
    def latent_size(self) -> int:
        return self.image_size // (2 ** (len(self.vae_ch_mult) - 1))

    def setup(self):
        io_ch = self.latent_channel + self.extra_latent_channel  # 15
        self.unet = MultiViewUNet(
            in_channels=io_ch,
            out_channels=io_ch,
            model_channels=self.model_channels,
            num_res_blocks=self.num_res_blocks,
            channel_mult=self.channel_mult,
            num_head_channels=self.num_head_channels,
            context_dim=self.context_dim,
            disable_3d_attentions=self.disable_3d_attentions,
            use_checkpoint=self.use_checkpoint,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            view_axis=self.view_axis,
        )
        self.vae = AutoencoderKL(
            embed_dim=self.latent_channel, ch=self.vae_ch,
            ch_mult=self.vae_ch_mult, dtype=self.dtype,
        )
        self.text_encoder = CLIPTextModel(
            width=self.clip_width, num_layers=self.clip_layers,
            num_heads=self.clip_width // 64, dtype=self.dtype,
        )

    # -- encoders/decoders ---------------------------------------------------
    def encode_text(self, input_ids: jax.Array) -> jax.Array:
        """(B, 77) int ids -> (B, 77, context_dim)."""
        return self.text_encoder(input_ids)

    def encode_image(self, images: jax.Array, key: jax.Array | None = None) -> jax.Array:
        """(B, N, 3, H, W) in [-1,1] -> scaled latents (B, N, 4, h, w)."""
        B, N = images.shape[:2]
        post = self.vae.encode(images.reshape((B * N,) + images.shape[2:]))
        z = post.mode() if key is None else post.sample(key)
        z = z * VAE_SCALE
        return z.reshape((B, N) + z.shape[1:])

    def decode_latent(self, latents: jax.Array) -> jax.Array:
        """(B, N, 4, h, w) -> images (B, N, 3, H, W)."""
        B, N = latents.shape[:2]
        z = latents.reshape((B * N,) + latents.shape[2:]) / VAE_SCALE
        img = self.vae.decode(z)
        return img.reshape((B, N) + img.shape[1:])

    # -- the denoiser --------------------------------------------------------
    def denoise(
        self,
        latents_noisy: jax.Array,   # (B, N, C, h, w): noisy RGBD latents (+mask ch)
        text_embeddings: jax.Array,  # (B, L, D) — repeated per view inside
        t: jax.Array,                # (B, N) noise conditioning (c_noise(sigma) or step)
        cameras: jax.Array | None = None,  # (B, N, 18) -> low-res raymap cond
        num_views: int | None = None,
        text_kv: dict | None = None,  # precomputed per-site text K/V whose
        # rows match the per-view-repeated context (see unet_mv.precompute_text_kv)
    ) -> jax.Array:
        """Returns the x0/v/eps prediction for the first 8 channels."""
        B, N, C, h, w = latents_noisy.shape
        x = latents_noisy
        if cameras is not None:
            rm = make_raymap(cameras, h, w).astype(x.dtype)  # (B, N, 6, h, w)
            x = jnp.concatenate([x, rm], axis=2)
        ctx = jnp.repeat(text_embeddings[:, None], N, axis=1)
        ctx = ctx.reshape((B * N,) + text_embeddings.shape[1:])
        out = self.unet(
            x.reshape(B * N, -1, h, w),
            t.reshape(B * N),
            ctx,
            num_frames=num_views if num_views is not None else N,
            text_kv=text_kv,
        )
        out = out.reshape(B, N, -1, h, w)
        return out[:, :, :8]

    def __call__(self, latents_noisy, text_embeddings, t, cameras=None):
        return self.denoise(latents_noisy, text_embeddings, t, cameras)

    def init_everything(self, images, input_ids, latents_noisy,
                        text_embeddings, t, cameras):
        """Touch every submodule so ``init`` creates all parameters.

        (flax only materializes params reached by the init method; the
        denoise path alone would skip the VAE and text encoder.)
        """
        z = self.encode_image(images)
        _ = self.decode_latent(z)
        _ = self.encode_text(input_ids)
        return self.denoise(latents_noisy, text_embeddings, t, cameras)
