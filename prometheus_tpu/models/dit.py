"""DiT primitives: adaLN-zero blocks, timestep embedder, sinusoid tables.

Shared by the GSDecoder's cross-view DiT (reference ``modules/ray_diff.py``)
and the camera-trajectory TrajDiT (reference ``modules/dit.py`` /
``systems/traj_dit_system.py``). adaLN modulation layers are zero-initialized
so blocks start as identity (DiT convention).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention
from .layers import timestep_embedding

Dtype = Any


def sinusoid_table(n_position: int, d_hid: int, base: float) -> np.ndarray:
    """Classic interleaved sin/cos position table ``(n_position, d_hid)``."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(base, 2 * (dim // 2) / d_hid)
    table = np.where(dim % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        emb = timestep_embedding(t, self.freq_size)  # cos-first (GLIDE/DiT)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(emb)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(jax.nn.silu(h))


def modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class MultiHeadSelfAttention(nn.Module):
    """``gather_kv_axis``: view-sharded joint attention — K/V are projected
    from the LOCAL tokens then all-gathered over the mesh axis (attention is
    permutation-invariant in keys, so device-order concat is exact)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    gather_kv_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        d = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, self.num_heads, d), 3, axis=2)
        k, v = k[:, :, 0], v[:, :, 0]
        if self.gather_kv_axis is not None:
            k = jax.lax.all_gather(k, self.gather_kv_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.gather_kv_axis, axis=1, tiled=True)
        out = scaled_dot_product_attention(q[:, :, 0], k, v)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out.reshape(b, t, c))


class MultiHeadCrossAttention(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, t, c = x.shape
        d = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(context)
        out = scaled_dot_product_attention(
            q.reshape(b, t, self.num_heads, d),
            k.reshape(b, context.shape[1], self.num_heads, d),
            v.reshape(b, context.shape[1], self.num_heads, d),
        )
        return nn.Dense(c, dtype=self.dtype, name="proj")(out.reshape(b, t, c))


class Mlp(nn.Module):
    hidden: int
    # tanh-approx matches ray_diff.py:396 GELU(approximate='tanh'); the
    # TrajDiT blocks use the exact erf form (reference dit.py:186 nn.GELU())
    gelu_approximate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=self.gelu_approximate)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)


class DiTBlock(nn.Module):
    """adaLN-zero transformer block (optionally with text cross-attention)."""

    num_heads: int
    mlp_ratio: float = 4.0
    use_cross_attention: bool = False
    dtype: Dtype = jnp.float32
    gather_kv_axis: str | None = None

    @nn.compact
    def __call__(self, x, c, context=None):
        hidden = x.shape[-1]
        mod = nn.Dense(
            6 * hidden, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(jax.nn.silu(c))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
        norm = lambda y, nm: nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, name=nm)(y)
        x = x + g_a[:, None, :] * MultiHeadSelfAttention(
            self.num_heads, dtype=self.dtype,
            gather_kv_axis=self.gather_kv_axis, name="attn"
        )(modulate(norm(x, "norm1"), sh_a, sc_a))
        if self.use_cross_attention:
            assert context is not None
            x = x + MultiHeadCrossAttention(
                self.num_heads, dtype=self.dtype, name="cross_attn"
            )(norm(x, "norm_cross"), context)
        x = x + g_m[:, None, :] * Mlp(
            int(hidden * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(modulate(norm(x, "norm2"), sh_m, sc_m))
        return x


class FinalLayer(nn.Module):
    """adaLN-modulated output projection."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        hidden = x.shape[-1]
        mod = nn.Dense(
            2 * hidden, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(jax.nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="norm_final")(x),
            shift, scale,
        )
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="linear")(x)
