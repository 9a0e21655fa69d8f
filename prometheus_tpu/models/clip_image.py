"""CLIP ViT-H image encoder (image-to-3D conditioning tower).

Parity target: the reference's ``CLIPVisionModelWithProjection`` usage
(``mv_ldm.py:72-82,134-163``): reference images are embedded and used in
place of text embeddings for the image-to-3D task. ViT-H/14 vision tower:
patch 14, width 1280, 32 layers, 16 heads, pre/post layernorm, class token;
``encode_image_clip`` returns per-patch hidden states projected to the
U-Net's 1024-dim context space.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention

_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionLayer(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        d = c // self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(h)
        attn = scaled_dot_product_attention(
            q.reshape(b, t, self.num_heads, d),
            k.reshape(b, t, self.num_heads, d),
            v.reshape(b, t, self.num_heads, d))
        x = x + nn.Dense(c, dtype=self.dtype, name="out_proj")(
            attn.reshape(b, t, c))
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick-gelu
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(h)


class CLIPImageEncoder(nn.Module):
    """Returns projected per-token embeddings (B, 1+P^2, proj_dim)."""

    image_size: int = 224
    patch: int = 14
    width: int = 1280
    num_heads: int = 16
    num_layers: int = 32
    proj_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images (B, 3, H, W) in [-1, 1]; resized to ``image_size``."""
        B = images.shape[0]
        x = jnp.moveaxis(images, 1, -1) * 0.5 + 0.5
        x = jax.image.resize(
            x, (B, self.image_size, self.image_size, 3), method="bilinear")
        x = (x - _CLIP_MEAN) / _CLIP_STD
        tok = nn.Conv(self.width, (self.patch, self.patch),
                      strides=(self.patch, self.patch), padding="VALID",
                      use_bias=False, dtype=self.dtype, name="patch_embed")(x)
        g = self.image_size // self.patch
        tok = tok.reshape(B, g * g, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (g * g + 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)), tok], 1) + pos
        x = nn.LayerNorm(epsilon=1e-5, name="pre_ln")(x)
        for i in range(self.num_layers):
            x = CLIPVisionLayer(self.num_heads, dtype=self.dtype,
                                name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="post_ln")(x)
        return nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(x)
