"""TrajDiT: text -> camera-trajectory diffusion transformer.

Parity target: ``/root/reference/prometheus/systems/traj_dit_system.py`` and
``modules/dit.py``. 29 camera tokens of 11 dims (quaternion 4 + translation 3
+ normalized intrinsics 4) are denoised by an 8-block DiT (hidden 512, 8
heads) whose blocks run text cross-attention, then self-attention, then MLP,
each gated by a 9-way adaLN-zero modulation. Sampling is 100-step
deterministic DDIM in sample-prediction mode with per-step quaternion
renormalization. Token<->camera codecs included.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.quaternion import matrix_to_quaternion, quaternion_to_matrix
from .dit import Mlp, MultiHeadCrossAttention, MultiHeadSelfAttention, TimestepEmbedder

Dtype = Any

TOKEN_DIM = 11  # quat 4 + translation 3 + intrinsics 4


# ---------------------------------------------------------------------------
# Camera-vector <-> token codecs (traj_dit_system.py:34-66)
# ---------------------------------------------------------------------------

def camera_to_token(cameras: jax.Array) -> jax.Array:
    """(B, N, 18) camera vectors -> (B, N, 11) tokens."""
    B, N, _ = cameras.shape
    rt = cameras[..., :12].reshape(B, N, 3, 4)
    quat = matrix_to_quaternion(rt[..., :3, :3])
    trans = rt[..., :3, 3]
    fx, fy, cx, cy, H, W = [cameras[..., 12 + i] for i in range(6)]
    intr = jnp.stack([fx / H, fy / W, cx / H, cy / W], axis=-1)
    return jnp.concatenate([quat, trans, intr], axis=-1)


def token_to_camera(tokens: jax.Array, image_size: int) -> jax.Array:
    """(B, N, 11) tokens -> (B, N, 18) camera vectors at ``image_size``^2."""
    B, N, _ = tokens.shape
    # Guard degenerate (near-zero) quaternions — an untrained/zero-init model
    # emits them, and quaternion_to_matrix would produce NaN cameras.
    quat = tokens[..., :4]
    qn = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0], tokens.dtype)
    quat = jnp.where(qn < 1e-4, ident, quat / jnp.maximum(qn, 1e-4))
    R = quaternion_to_matrix(quat)
    T = tokens[..., 4:7][..., None]
    rt = jnp.concatenate([R, T], axis=-1).reshape(B, N, 12)
    s = float(image_size)
    # Clamp focal lengths away from zero (same degenerate-model guard).
    fx = jnp.maximum(tokens[..., 7], 1e-3) * s
    fy = jnp.maximum(tokens[..., 8], 1e-3) * s
    intr = jnp.stack(
        [fx, fy, tokens[..., 9] * s, tokens[..., 10] * s,
         jnp.full((B, N), s), jnp.full((B, N), s)],
        axis=-1,
    )
    return jnp.concatenate([rt, intr], axis=-1)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class TrajDiTBlock(nn.Module):
    """cross-attn -> self-attn -> mlp, each adaLN-zero gated (9-way)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, c):
        hidden = x.shape[-1]
        mod = nn.Dense(9 * hidden, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="adaLN_modulation")(c)
        (sh_ca, sc_ca, g_ca, sh_sa, sc_sa, g_sa,
         sh_m, sc_m, g_m) = jnp.split(mod, 9, axis=-1)
        norm = lambda v, nm: nn.LayerNorm(use_bias=False, use_scale=False,
                                          epsilon=1e-6, name=nm)(v)
        mod_fn = lambda v, sh, sc: v * (1 + sc[:, None]) + sh[:, None]
        x = x + g_ca[:, None] * MultiHeadCrossAttention(
            self.num_heads, dtype=self.dtype, name="cattn")(
            mod_fn(norm(x, "norm1"), sh_ca, sc_ca), y)
        x = x + g_sa[:, None] * MultiHeadSelfAttention(
            self.num_heads, dtype=self.dtype, name="sattn")(
            mod_fn(norm(x, "norm2"), sh_sa, sc_sa))
        # traj_dit_system.py:107 uses GELU(approximate='tanh') (the default
        # gelu_approximate=True), unlike dit.py:186's exact nn.GELU()
        x = x + g_m[:, None] * Mlp(int(hidden * self.mlp_ratio),
                                   dtype=self.dtype, name="mlp")(
            mod_fn(norm(x, "norm3"), sh_m, sc_m))
        return x


class TrajDiTModel(nn.Module):
    hidden_size: int = 512
    num_blocks: int = 8
    num_tokens: int = 29
    num_heads: int = 8
    mlp_ratio: float = 4.0
    text_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens_noisy: jax.Array, text_embeddings: jax.Array,
                 t: jax.Array) -> jax.Array:
        """tokens (B, 29, 11); text (B, L, 1024); t (B,) -> sample prediction."""
        y = nn.Dense(self.hidden_size, dtype=self.dtype,
                     name="y_embedder")(text_embeddings)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     name="in_block")(tokens_noisy)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.num_tokens, self.hidden_size))
        x = x + pos
        c = jax.nn.silu(TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                         name="t_embedder")(t))
        for i in range(self.num_blocks):
            x = TrajDiTBlock(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                             name=f"block_{i}")(x, y, c)
        return nn.Dense(TOKEN_DIM, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="out_block")(x)
