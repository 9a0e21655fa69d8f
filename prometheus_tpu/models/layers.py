"""Shared nn building blocks (flax.linen, NHWC internally, bf16-friendly).

From-scratch JAX counterparts of the reference's torch modules
(``vae_hacked.py`` / ``unet_hacked.py`` primitives): resnet blocks, spatial
attention, up/downsampling, timestep embeddings, EMANorm. Convs run NHWC
(TPU-native layout); module boundaries in higher layers stay NCHW for parity
with the reference's data contract.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention

Dtype = Any


def nonlinearity(x):
    return jax.nn.silu(x)


class _GroupNormCore(nn.Module):
    """Lane-aligned GroupNorm (f32 stats, one fused normalize pass).

    flax's ``nn.GroupNorm`` reduces over a ``[..., G, C//G]`` reshape; the
    group-split axis breaks the TPU lane (minor-most) layout and the XLA
    reduce fusions run far below HBM bandwidth — profiled at ~1/3 of the
    whole MV-LDM sampler scan. This core instead reduces spatial axes only
    (lanes preserved) into per-channel [B, C] sums, combines groups on that
    tiny tensor, folds the affine into one scale/bias, and applies a single
    fused multiply-add. Same math as flax's default
    (``use_fast_variance=True``): var = E[x^2] - E[x]^2 in f32.

    Param names/paths match ``nn.GroupNorm`` (``scale``/``bias`` under the
    parent's ``GroupNorm_0`` scope) so existing weight maps and checkpoints
    load unchanged.
    """

    num_groups: int
    epsilon: float

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        red_axes = tuple(range(1, x.ndim - 1))
        n = math.prod(x.shape[1:-1]) * (c // g)
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=red_axes)            # [B, C], lanes preserved
        s2 = jnp.sum(xf * xf, axis=red_axes)       # fused into the same pass
        b = s1.shape[0]
        g1 = s1.reshape(b, g, c // g).sum(-1)      # tiny group combine
        g2 = s2.reshape(b, g, c // g).sum(-1)
        mean = g1 / n
        var = jnp.maximum(g2 / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)    # [B, G]
        # broadcast group stats back to channels, fold the affine
        inv_c = jnp.broadcast_to(inv[:, :, None], (b, g, c // g)).reshape(b, c)
        mean_c = jnp.broadcast_to(mean[:, :, None], (b, g, c // g)).reshape(b, c)
        scale = inv_c * gamma                      # [B, C] f32
        bias = beta - mean_c * scale
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        y = xf * scale.reshape(bshape) + bias.reshape(bshape)
        return y.astype(x.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype."""

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        # full-size configs always divide by 32; tiny test configs fall back
        groups = self.num_groups
        while x.shape[-1] % groups != 0:
            groups //= 2
        return _GroupNormCore(num_groups=groups, epsilon=self.eps,
                              name="GroupNorm_0")(x)


class Conv2d(nn.Module):
    """3x3/1x1 conv, NHWC."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.padding,
            dtype=self.dtype,
        )(x)


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0,
                       flip_sin_cos: bool = False) -> jax.Array:
    """Sinusoidal timestep embedding ``(..., dim)`` (SD convention: cos after sin)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    if flip_sin_cos:  # diffusers-style (sin first)
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    else:  # LDM/openai convention (cos first) — matches SD-2.1 U-Net weights
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class ResnetBlock(nn.Module):
    """VAE-style residual block: GN-silu-conv x2 + (1x1) shortcut."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(name="norm1")(x)
        h = Conv2d(self.out_channels, dtype=self.dtype, name="conv1")(nonlinearity(h))
        h = GroupNorm32(name="norm2")(h)
        h = Conv2d(self.out_channels, dtype=self.dtype, name="conv2")(nonlinearity(h))
        if x.shape[-1] != self.out_channels:
            x = Conv2d(self.out_channels, kernel=1, dtype=self.dtype,
                       name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over (H*W) tokens (VAE mid-block)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm32(name="norm")(x)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y).reshape(b, h * w, 1, c)
        k = nn.Dense(c, dtype=self.dtype, name="k")(y).reshape(b, h * w, 1, c)
        v = nn.Dense(c, dtype=self.dtype, name="v")(y).reshape(b, h * w, 1, c)
        out = scaled_dot_product_attention(q, k, v).reshape(b, h, w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv downsample with the SD VAE's asymmetric (0,1) padding."""

    out_channels: int
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding="VALID", dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv."""

    out_channels: int
    with_conv: bool = True
    use_ema_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.with_conv:
            x = Conv2d(self.out_channels, dtype=self.dtype, name="conv")(x)
            if self.use_ema_norm:
                x = EMANorm(name="ema_norm")(x, train=train)
        return x


class EMANorm(nn.Module):
    """EMA magnitude normalizer (stabilizes pixel-loss decoder training).

    Tracks an EMA of ``mean(x^2)`` in a mutable ``batch_stats`` collection and
    rescales activations by its inverse sqrt
    (reference semantics: ``gs_decoder.py:174-189``).
    """

    beta: float = 0.995

    @nn.compact
    def __call__(self, x, train: bool = False):
        ema = self.variable("batch_stats", "magnitude_ema",
                            lambda: jnp.ones((), jnp.float32))
        if train and not self.is_initializing():
            mag = jnp.mean(jax.lax.stop_gradient(x).astype(jnp.float32) ** 2)
            new = mag + self.beta * (ema.value - mag)  # lerp(mag, ema, beta)
            ema.value = jnp.where(jnp.isnan(mag), ema.value, new)
        gain = jax.lax.rsqrt(ema.value + 1e-5)
        return (x * gain).astype(x.dtype)


class StridedDownsampleConv(nn.Module):
    """Channel-changing stride-2 conv (the GSDecoder DiT's conv_in)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class UpsampleConv(nn.Module):
    """Nearest 2x + channel-changing conv (the GSDecoder DiT's conv_out)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return Conv2d(self.out_channels, dtype=self.dtype, name="conv")(x)
