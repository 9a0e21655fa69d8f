"""CLIP ViT-H image encoder (image-to-3D conditioning tower).

Parity target: the reference's ``CLIPVisionModelWithProjection`` usage
(``/root/reference/prometheus/models/mv_ldm.py:72-82`` construction and
``encode_image_clip`` ``:134-163``): reference images in [-1, 1] are
bicubic-resized to 224 (``align_corners=True, antialias=True``),
CLIP-normalized, and embedded; the returned ``image_embeds`` — the POOLED
(CLS) hidden state through ``post_layernorm`` and ``visual_projection`` —
are used in place of text embeddings, one 1024-dim token per reference
image. ViT-H/14: patch 14, width 1280, 32 layers, 16 heads, erf-GELU
(the laion/OpenCLIP tower; OpenAI towers use quick-gelu — configurable).

Weight conversion from the transformers state dict lives in
``weight_maps.map_clip_vision``; forward parity vs the real
``CLIPVisionModelWithProjection`` is asserted in
``tests/test_reference_parity.py::test_clip_vision_parity``.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention

_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


# ---------------------------------------------------------------------------
# torch-exact bicubic resize (align_corners=True, antialias=True)
# ---------------------------------------------------------------------------

def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL/antialiased-torch cubic convolution kernel (A=-0.5)."""
    x = np.abs(x)
    return np.where(x < 1, ((a + 2) * x - (a + 3)) * x * x + 1,
                    np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0))


@functools.cache
def _bicubic_aa_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) weight matrix of torch's
    ``F.interpolate(mode='bicubic', align_corners=True, antialias=True)``
    (verified to <2e-5 against torch across up/down-scales): PIL-style
    normalized A=-0.5 filter, support widened by the align-corners scale
    ``(n_in-1)/(n_out-1)`` when downscaling."""
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else float(n_in)
    ss = max(scale, 1.0)
    support = 2.0 * ss
    W = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        center = scale * (i + 0.5)
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), n_in)
        js = np.arange(xmin, xmax)
        w = _cubic((js - center + 0.5) / ss)
        W[i, js] = w / w.sum()
    return W


def resize_bicubic_torch(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize (..., H, W) exactly like the reference's
    ``F.interpolate(x, (224, 224), mode='bicubic', align_corners=True,
    antialias=True)`` (mv_ldm.py:144). Separable matmuls — MXU-friendly."""
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (out_h, out_w):
        return x
    Wh = jnp.asarray(_bicubic_aa_matrix(h, out_h), x.dtype)
    Ww = jnp.asarray(_bicubic_aa_matrix(w, out_w), x.dtype)
    x = jnp.einsum("...hw,wq->...hq", x, Ww.T,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("oh,...hq->...oq", Wh, x,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Vision transformer
# ---------------------------------------------------------------------------

class CLIPVisionLayer(nn.Module):
    num_heads: int
    hidden_act: str = "gelu"
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
        if self.hidden_act == "quick_gelu":     # OpenAI CLIP towers
            h = h * jax.nn.sigmoid(1.702 * h)
        else:                                    # laion/OpenCLIP: erf gelu
            h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(h)


class CLIPImageEncoder(nn.Module):
    """Returns pooled+projected ``image_embeds`` (B, proj_dim) — the
    reference's ``self.image_encoder(pixel_values).image_embeds``
    (mv_ldm.py:159)."""

    image_size: int = 224
    patch: int = 14
    width: int = 1280
    num_heads: int = 16
    num_layers: int = 32
    proj_dim: int = 1024
    hidden_act: str = "gelu"   # ViT-H is laion-trained (erf); "quick_gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images (B, 3, H, W) in [-1, 1] -> image_embeds (B, proj_dim)."""
        B = images.shape[0]
        # reference preprocessing (mv_ldm.py:140-156): bicubic 224 with
        # align_corners+antialias ON THE [-1,1] values, then unnormalize to
        # [0,1] and apply the CLIP mean/std (no center-crop / rescale)
        x = resize_bicubic_torch(images, self.image_size, self.image_size)
        x = jnp.moveaxis(x, 1, -1) * 0.5 + 0.5
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
            x = CLIPVisionLayer(self.num_heads, hidden_act=self.hidden_act,
                                dtype=self.dtype, name=f"layer_{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_ln")(x[:, 0])
        return nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled)
