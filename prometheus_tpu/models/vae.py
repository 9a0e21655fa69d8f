"""AutoencoderKL: SD KL-f8 VAE with the GS-decoder "extra_z" hack (flax).

Architecture parity with the reference's vendored LDM VAE
(``/root/reference/prometheus/modules/vae_hacked.py``): ch=128,
ch_mult=(1,2,4,4), 2 encoder res-blocks per level (3 in the decoder), mid
res-attn-res, GroupNorm(32, eps 1e-6), swish. The decoder hack
(``vae_hacked.py:1029-1043``): ``decode(z, extra_z=...)`` concatenates extra
conditioning channels after ``post_quant_conv`` so ``conv_in`` consumes
``z_channels + extra_channels``; ``conv_out`` can emit ``out_ch != 3`` (14
gaussian channels) and EMANorm can be injected after each non-final upsample
conv (``gs_decoder.py:66-73``).

Module boundary layout is NCHW (reference data contract); internals are NHWC.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    AttnBlock,
    Conv2d,
    Downsample,
    GroupNorm32,
    ResnetBlock,
    Upsample,
    nonlinearity,
)

Dtype = Any


def _to_nhwc(x):
    return jnp.moveaxis(x, 1, -1)


def _to_nchw(x):
    return jnp.moveaxis(x, -1, 1)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) NHWC -> (B, H/8, W/8, 2*z or z)."""
        h = Conv2d(self.ch, dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dtype=self.dtype,
                                name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(h.shape[-1], dtype=self.dtype,
                               name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(name="norm_out")(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return Conv2d(out_c, dtype=self.dtype, name="conv_out")(nonlinearity(h))


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4         # native latent channels (pre-extra)
    extra_channels: int = 0     # concatenated conditioning channels
    out_ch: int = 3             # 3 for images, 14 for gaussian params
    use_ema_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        """z: (B, h, w, z_channels + extra_channels) NHWC."""
        block_in = self.ch * self.ch_mult[-1]
        h = Conv2d(block_in, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i in reversed(range(len(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * self.ch_mult[i], dtype=self.dtype,
                                name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(h.shape[-1], use_ema_norm=self.use_ema_norm,
                             dtype=self.dtype, name=f"up_{i}_upsample")(h, train=train)
        h = GroupNorm32(name="norm_out")(h)
        return Conv2d(self.out_ch, dtype=self.dtype, name="conv_out")(nonlinearity(h))


class DiagonalGaussian:
    """Posterior over latents: moments (B, 2C, h, w) NCHW."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape,
                                                        self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=(1, 2, 3),
        )


class AutoencoderKL(nn.Module):
    """SD VAE with quant/post-quant 1x1 convs. NCHW at the module boundary."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    decoder_extra_channels: int = 0
    decoder_out_ch: int = 3
    use_ema_norm: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, extra_channels=self.decoder_extra_channels,
            out_ch=self.decoder_out_ch, use_ema_norm=self.use_ema_norm,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        """x: (B, 3, H, W) in [-1, 1] -> posterior over (B, embed_dim, H/8, W/8)."""
        h = self.encoder(_to_nhwc(x))
        moments = self.quant_conv(h)
        return DiagonalGaussian(_to_nchw(moments))

    def decode(self, z: jax.Array, extra_z: jax.Array | None = None,
               post_conv: bool = True, train: bool = False) -> jax.Array:
        """z: (B, embed_dim, h, w); extra_z: (B, E, h, w) conditioning."""
        zh = _to_nhwc(z)
        if post_conv:
            zh = self.post_quant_conv(zh)
        if extra_z is not None:
            zh = jnp.concatenate([zh, _to_nhwc(extra_z)], axis=-1)
        return _to_nchw(self.decoder(zh, train=train))

    def __call__(self, x, key=None, sample_posterior: bool = True, train: bool = False):
        posterior = self.encode(x)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(z, train=train), posterior
