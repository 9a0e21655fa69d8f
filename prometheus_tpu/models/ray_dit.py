"""Cross-view DiT: the GSDecoder's multi-view information mixer.

Parity target: ``/root/reference/prometheus/modules/ray_diff.py:448-660`` and
its use in ``gs_decoder.py:143-154``. Tokens from all N views are flattened
into one joint attention sequence of ``N * (width^2)`` tokens; per-view and
per-patch sinusoidal position tables (bases 10000 / 70007) are added before
the blocks. In the GSDecoder the DiT is wrapped by a stride-2 ``conv_in``
(14 -> in_channels) and a 2x-upsample ``conv_out`` (out_channels -> 14).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dit import DiTBlock, FinalLayer, TimestepEmbedder, sinusoid_table
from .layers import StridedDownsampleConv, UpsampleConv

Dtype = Any


class CrossViewDiT(nn.Module):
    """DiT over patchified multi-view feature grids, joint-view attention.

    Input/output: ``(B, N, C, H, W)`` (NCHW per view, reference contract).
    """

    in_channels: int = 392
    out_channels: int = 392
    width: int = 16          # token grid side per view
    hidden_size: int = 1152
    depth: int = 16
    num_heads: int = 16
    mlp_ratio: float = 4.0
    max_num_images: int = 8
    patch_size: int = 1
    dtype: Dtype = jnp.float32
    # view-sharded (sequence-parallel) decode: N counts only this device's
    # views; joint attention all-gathers K/V over the mesh axis and the
    # per-view position table is offset by the device's global view index.
    view_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, t) -> jax.Array:
        B, N, C, H, W = x.shape
        P = self.patch_size
        h, w = H // P, W // P
        num_patches = h * w

        # Patch embed (conv P x P stride P), NHWC internally.
        xh = jnp.moveaxis(x.reshape(B * N, C, H, W), 1, -1)
        xh = nn.Conv(self.hidden_size, (P, P), strides=(P, P), padding="VALID",
                     dtype=self.dtype, name="x_embedder")(xh)
        tokens = xh.reshape(B, N, num_patches, self.hidden_size)

        # Per-view + per-patch sinusoidal position encodings.
        view_table = jnp.asarray(
            sinusoid_table(self.max_num_images, self.hidden_size, 10000.0))
        if self.view_axis is not None:
            # this shard holds global views [idx*N, (idx+1)*N)
            start = jax.lax.axis_index(self.view_axis) * N
            view_pe = jax.lax.dynamic_slice_in_dim(view_table, start, N, 0)
        else:
            view_pe = view_table[:N]
        view_pe = view_pe[None, :, None, :]
        patch_pe = jnp.asarray(
            sinusoid_table(num_patches, self.hidden_size, 70007.0)
        )[None, None, :, :]
        tokens = tokens + view_pe + patch_pe
        tokens = tokens.reshape(B, N * num_patches, self.hidden_size)

        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (B,))
        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                             name="t_embedder")(t)

        for i in range(self.depth):
            tokens = DiTBlock(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                              gather_kv_axis=self.view_axis,
                              name=f"block_{i}")(tokens, c)

        out = FinalLayer(P * P * self.out_channels, dtype=self.dtype,
                         name="final_layer")(tokens, c)
        # Unpatchify back to (B, N, C_out, H, W).
        out = out.reshape(B * N, h, w, P, P, self.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B * N, H, W, self.out_channels)
        return jnp.moveaxis(out, -1, 1).reshape(B, N, self.out_channels, H, W)


class CrossViewDiTWrapped(nn.Module):
    """conv_in (stride-2 down) -> CrossViewDiT -> conv_out (2x up).

    Maps (B, N, C_lat, 32, 32) latents to a same-shape refinement that the
    GSDecoder concatenates with the raw latents before VAE decoding
    (``gs_decoder.py:147-154``).
    """

    latent_channels: int = 14   # rgb 4 + depth 4 + raymap 6
    dit_channels: int = 392
    hidden_size: int = 1152
    depth: int = 16
    num_heads: int = 16
    max_num_images: int = 8
    dtype: Dtype = jnp.float32
    view_axis: str | None = None

    @nn.compact
    def __call__(self, latents: jax.Array, t=1000.0) -> jax.Array:
        B, N, C, H, W = latents.shape
        xh = jnp.moveaxis(latents.reshape(B * N, C, H, W), 1, -1)
        xh = StridedDownsampleConv(self.dit_channels, dtype=self.dtype,
                                   name="conv_in")(xh)
        x = jnp.moveaxis(xh, -1, 1).reshape(B, N, self.dit_channels, H // 2, W // 2)
        x = CrossViewDiT(
            in_channels=self.dit_channels, out_channels=self.dit_channels,
            width=H // 2, hidden_size=self.hidden_size, depth=self.depth,
            num_heads=self.num_heads, max_num_images=self.max_num_images,
            dtype=self.dtype, view_axis=self.view_axis, name="dit",
        )(x, t)
        xh = jnp.moveaxis(x.reshape(B * N, self.dit_channels, H // 2, W // 2), 1, -1)
        xh = UpsampleConv(self.latent_channels, dtype=self.dtype,
                          name="conv_out")(xh)
        return jnp.moveaxis(xh, -1, 1).reshape(B, N, self.latent_channels, H, W)
