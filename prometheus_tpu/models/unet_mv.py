"""MultiViewUNet: SD-2.1-class U-Net with cross-view "3D" self-attention.

From-scratch flax implementation of the reference's hacked LDM U-Net
(``/root/reference/prometheus/modules/unet_hacked.py``):

- SD-2.1 topology: model_channels 320, channel_mult (1,2,4,4), 2 res blocks
  per level, spatial transformers (depth 1, linear proj, GEGLU ff, head dim
  64, text context 1024) at downsample factors 1/2/4, time embed 320 -> 1280.
- The "3D" hack: inside self-attention, the per-view token grids of all
  ``num_frames`` views are flattened into one sequence
  (``(b f) l c -> b (f l) c``, reference ``unet_hacked.py:647``) so views
  attend jointly; text cross-attention stays per-view. A 16-entry
  ``disable_3d_attentions`` mask keeps the highest-resolution sites 2-D
  (site order: 6 encoder, 1 middle, 9 decoder).
- Channel-padded ``conv_in``/``conv_out`` consume/emit
  ``4 + extra_latent_channel`` channels (RGB latent 4 + depth latent 4 +
  Plucker raymap 6 + view mask 1 = 15 for the flagship config).

Per-block ``nn.remat`` replaces torch gradient checkpointing. ``num_frames``
is static per jit trace (a call argument of the top module, an attribute of
the inner transformers). Module boundary is NCHW; internals NHWC.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention
from .layers import GroupNorm32, timestep_embedding

Dtype = Any


class TimeEmbed(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(t_emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(jax.nn.silu(h))


class ResBlock(nn.Module):
    """LDM U-Net residual block with timestep-embedding injection."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm32(eps=1e-5, name="in_norm")(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="in_conv")(jax.nn.silu(h))
        eh = nn.Dense(self.out_channels, dtype=self.dtype,
                      name="emb_proj")(jax.nn.silu(emb))
        h = h + eh[:, None, None, :]
        h = GroupNorm32(eps=1e-5, name="out_norm")(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(jax.nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    ``kv``: optional precomputed ``(k, v)`` projections of the context
    (each ``(B, Tk, inner)``) — the sampler hoists the CONSTANT text K/V out
    of its 100-step scan (they depend only on the prompt, not on x; see
    ``precompute_text_kv``). When given, ``to_k``/``to_v`` are skipped.

    ``gather_kv_axis``: mesh axis name for VIEW-SHARDED joint attention
    (sequence-parallel inference): K/V are projected from the LOCAL tokens
    and then all-gathered over the axis, so each device attends its local
    queries against every view's keys/values. Attention is permutation-
    invariant in the key axis, so the device-order concatenation is exact.
    """

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    gather_kv_axis: str | None = None

    @nn.compact
    def __call__(self, x, context=None, kv=None):
        inner = self.heads * self.dim_head
        b, tq, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        if kv is not None:
            k, v = (a.astype(self.dtype) for a in kv)
        else:
            ctx = x if context is None else context
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_v")(ctx)
        if self.gather_kv_axis is not None:
            k = jax.lax.all_gather(k, self.gather_kv_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.gather_kv_axis, axis=1, tiled=True)
        tk = k.shape[1]
        out = scaled_dot_product_attention(
            q.reshape(b, tq, self.heads, self.dim_head),
            k.reshape(b, tk, self.heads, self.dim_head),
            v.reshape(b, tk, self.heads, self.dim_head),
        )
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(
            out.reshape(b, tq, inner)
        )


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.dim_out, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        # torch F.gelu default is the exact (erf) form (unet_hacked.py:354)
        return a * jax.nn.gelu(gate, approximate=False)


class BasicTransformerBlock3D(nn.Module):
    """self-attn (joint over ``num_frames`` views) -> text cross-attn -> GEGLU ff.

    ``view_axis``: when set, ``num_frames`` counts only the LOCAL views of a
    view-sharded (shard_map) program; the joint self-attention gathers K/V
    across the mesh axis so attention still spans every view globally.
    """

    heads: int
    dim_head: int
    num_frames: int = 1
    dtype: Dtype = jnp.float32
    view_axis: str | None = None

    @nn.compact
    def __call__(self, x, context, kv=None):
        # x: (B*F, L, C). Flatten views for joint self-attention.
        bf, l, c = x.shape
        f = self.num_frames
        b = bf // f
        # dtype=self.dtype: stats stay f32 inside flax, but the OUTPUT keeps
        # the compute dtype — default dtype promotion (bf16 x, f32 params)
        # would materialize a full f32 tensor that the next Dense immediately
        # casts back down (pure HBM waste in the 100-step sampler scan).
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        attn1 = CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                               gather_kv_axis=self.view_axis, name="attn1")
        if f > 1 or self.view_axis is not None:
            h = attn1(h.reshape(b, f * l, c)).reshape(bf, l, c)
        else:
            h = attn1(h)
        x = x + h
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                               name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x),
            context, kv)
        x = x + nn.Dense(c, dtype=self.dtype, name="ff_out")(
            GEGLU(4 * c, dtype=self.dtype, name="ff_geglu")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x))
        )
        return x


class SpatialTransformer3D(nn.Module):
    """GN -> linear proj_in -> transformer block(s) -> zero-init proj_out + skip."""

    heads: int
    dim_head: int
    num_frames: int = 1     # 1 == 2-D attention (disable_3d)
    depth: int = 1
    dtype: Dtype = jnp.float32
    view_axis: str | None = None

    @nn.compact
    def __call__(self, x, context, kv=None):
        bf, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(eps=1e-6, name="norm")(x).reshape(bf, hh * ww, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock3D(
                self.heads, self.dim_head, num_frames=self.num_frames,
                dtype=self.dtype, view_axis=self.view_axis,
                name=f"block_{i}")(
                h, context, kv[i] if kv is not None else None)
        h = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     name="proj_out")(h)
        return x + h.reshape(bf, hh, ww, c)


class UNetDownsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class UNetUpsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(c, (3, 3), dtype=self.dtype, name="conv")(x)


class MultiViewUNet(nn.Module):
    """The stage-2 denoiser. Input/output NCHW ``(B*F, C, H, W)``."""

    in_channels: int = 15
    out_channels: int = 15
    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    attention_ds: Sequence[int] = (1, 2, 4)   # downsample factors with attention
    num_head_channels: int = 64
    context_dim: int = 1024
    transformer_depth: int = 1
    disable_3d_attentions: Sequence[int] = (1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1)
    use_checkpoint: bool = True
    # 'full' recomputes everything in the backward (min memory, ~1.3x fwd
    # FLOPs); 'dots' saves matmul outputs and recomputes only elementwise
    # chains (the usual TPU MFU sweet spot when HBM allows)
    remat_policy: str = "full"
    dtype: Dtype = jnp.float32
    # mesh axis name for view-sharded (sequence-parallel) inference: the
    # caller runs this module inside shard_map with the view/frame dim split
    # over the axis; every 3D-attention site all-gathers K/V across it.
    # 2D (disable_3d) sites stay per-view and never communicate.
    view_axis: str | None = None

    @nn.compact
    def __call__(self, x, timesteps, context, num_frames: int = 1,
                 text_kv: dict | None = None):
        """x (B*F, C, H, W); timesteps (B*F,); context (B*F, L, ctx_dim).

        ``text_kv``: optional ``{site_name: ((k, v), ...)}`` of precomputed
        text-context K/V projections (``precompute_text_kv``) — the sampler
        hoists these constants out of its denoising scan.
        """
        h = jnp.moveaxis(x, 1, -1)  # NHWC
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = TimeEmbed(4 * self.model_channels, dtype=self.dtype,
                        name="time_embed")(t_emb.astype(self.dtype))

        if self.use_checkpoint:
            kw = {}
            if self.remat_policy == "dots":
                kw["policy"] = \
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            st_cls = nn.remat(SpatialTransformer3D, **kw)
            res_cls = nn.remat(ResBlock, **kw)
        else:
            st_cls, res_cls = SpatialTransformer3D, ResBlock
        attn_site = [0]

        def attn(ch, name):
            site = attn_site[0]
            attn_site[0] += 1
            disable = bool(self.disable_3d_attentions[site]) \
                if site < len(self.disable_3d_attentions) else False
            mod = st_cls(
                heads=ch // self.num_head_channels,
                dim_head=self.num_head_channels,
                num_frames=1 if disable else num_frames,
                depth=self.transformer_depth,
                dtype=self.dtype, name=name,
                view_axis=None if disable else self.view_axis,
            )
            kv = text_kv.get(name) if text_kv is not None else None
            return lambda hh, ctx: mod(hh, ctx, kv)

        h = nn.Conv(self.model_channels, (3, 3), dtype=self.dtype,
                    name="conv_in")(h)
        skips = [h]
        ds = 1
        # --- encoder ---
        for level, mult in enumerate(self.channel_mult):
            ch = self.model_channels * mult
            for j in range(self.num_res_blocks):
                h = res_cls(ch, dtype=self.dtype,
                            name=f"down_{level}_res_{j}")(h, emb)
                if ds in self.attention_ds:
                    h = attn(ch, f"down_{level}_attn_{j}")(h, context)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                h = UNetDownsample(dtype=self.dtype,
                                   name=f"down_{level}_downsample")(h)
                skips.append(h)
                ds *= 2
        # --- middle ---
        ch = self.model_channels * self.channel_mult[-1]
        h = res_cls(ch, dtype=self.dtype, name="mid_res_1")(h, emb)
        h = attn(ch, "mid_attn")(h, context)
        h = res_cls(ch, dtype=self.dtype, name="mid_res_2")(h, emb)
        # --- decoder ---
        for level in reversed(range(len(self.channel_mult))):
            ch = self.model_channels * self.channel_mult[level]
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res_cls(ch, dtype=self.dtype,
                            name=f"up_{level}_res_{j}")(h, emb)
                if ds in self.attention_ds:
                    h = attn(ch, f"up_{level}_attn_{j}")(h, context)
            if level != 0:
                h = UNetUpsample(dtype=self.dtype,
                                 name=f"up_{level}_upsample")(h)
                ds //= 2
        h = GroupNorm32(eps=1e-5, name="out_norm")(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv_out")(
            jax.nn.silu(h))
        return jnp.moveaxis(h, -1, 1)


def attention_site_names(channel_mult=(1, 2, 4, 4), num_res_blocks=2,
                         attention_ds=(1, 2, 4)) -> list[str]:
    """Attention-site names in the U-Net's traversal order (must mirror
    ``MultiViewUNet.__call__`` exactly — it indexes ``disable_3d_attentions``
    and ``text_kv`` in this order)."""
    names = []
    ds = 1
    for level in range(len(channel_mult)):
        for j in range(num_res_blocks):
            if ds in attention_ds:
                names.append(f"down_{level}_attn_{j}")
        if level != len(channel_mult) - 1:
            ds *= 2
    names.append("mid_attn")
    for level in reversed(range(len(channel_mult))):
        for j in range(num_res_blocks + 1):
            if ds in attention_ds:
                names.append(f"up_{level}_attn_{j}")
        if level != 0:
            ds //= 2
    return names


def precompute_text_kv(unet_params: dict, context: jax.Array,
                       *, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
                       attention_ds=(1, 2, 4),
                       transformer_depth: int = 1) -> dict:
    """Project the (constant) text context through every site's ``attn2``
    ``to_k``/``to_v`` once, for reuse across all denoising steps.

    The text K/V depend only on the prompt — recomputing them inside the
    100-step sampler scan wastes ~16 matmuls x 2 x 100 steps (VERDICT
    round-2 weak #5). ``context``: the FINAL per-view-repeated, CFG-stacked
    rows the U-Net will see (``(B*F, L, ctx_dim)``).
    Returns ``{site_name: ((k, v), ... per transformer depth)}``.
    """
    out = {}
    for name in attention_site_names(channel_mult, num_res_blocks,
                                     attention_ds):
        site = unet_params[name]
        per_depth = []
        for d in range(transformer_depth):
            blk = site[f"block_{d}"]["attn2"]
            k = context @ blk["to_k"]["kernel"].astype(context.dtype)
            v = context @ blk["to_v"]["kernel"].astype(context.dtype)
            per_depth.append((k, v))
        out[name] = tuple(per_depth)
    return out
