"""DepthAnything-V2 (Small): monocular relative-depth teacher in flax.

Replaces the reference's frozen torch DepthAnything-V2 pseudo-depth teacher
(``base_system.py:164-169,362-381``): a DINOv2 ViT-S/14 backbone (384 width,
12 layers, 6 heads, patch 14, learned pos-embed with bilinear interpolation)
feeding a DPT head (4-level reassemble -> fusion -> disparity). Weights load
from the published torch checkpoint via ``load_torch_da2_weights``; random
init keeps the training pipeline executable offline (pseudo-depth is then
uninformative but well-formed).

Outputs normalized disparity in [0, 1] (reference ``get_depth_gt`` with
``return_disp=True, normalize=True``).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention

PATCH = 14
# ViT-S/14 dims
WIDTH, LAYERS, HEADS = 384, 12, 6
# DPT head dims for the small model
FEAT_DIM = 64
OUT_LAYERS = (2, 5, 8, 11)
_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class ViTBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        d = c // self.heads
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, self.heads, d), 3, axis=2)
        attn = scaled_dot_product_attention(q[:, :, 0], k[:, :, 0], v[:, :, 0])
        h = nn.Dense(c, dtype=self.dtype, name="proj")(attn.reshape(b, t, c))
        ls1 = self.param("ls1", nn.initializers.constant(1e-5), (c,))
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(jax.nn.gelu(h))
        ls2 = self.param("ls2", nn.initializers.constant(1e-5), (c,))
        return x + h * ls2


class DINOv2Small(nn.Module):
    """Returns intermediate tokens (no cls) from OUT_LAYERS, (B, h*w, 384)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) normalized
        B, H, W, _ = x.shape
        gh, gw = H // PATCH, W // PATCH
        tok = nn.Conv(WIDTH, (PATCH, PATCH), strides=(PATCH, PATCH),
                      padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        tok = tok.reshape(B, gh * gw, WIDTH)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, WIDTH))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 37 * 37 + 1, WIDTH))  # 518/14 = 37 native grid
        # interpolate patch pos-embed to the current grid
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        native = int(np.sqrt(pos_patch.shape[1]))
        pos_patch = jax.image.resize(
            pos_patch.reshape(1, native, native, WIDTH),
            (1, gh, gw, WIDTH), method="bicubic").reshape(1, gh * gw, WIDTH)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, WIDTH)) + pos_cls,
             tok + pos_patch], axis=1)
        outs = []
        for i in range(LAYERS):
            tokens = ViTBlock(WIDTH, HEADS, dtype=self.dtype,
                              name=f"block_{i}")(tokens)
            if i in OUT_LAYERS:
                outs.append(nn.LayerNorm(epsilon=1e-6, name=f"out_norm_{i}")(
                    tokens[:, 1:]))
        return outs, (gh, gw)


class ResidualConvUnit(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype,
                    name="conv1")(jax.nn.relu(x))
        h = nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype,
                    name="conv2")(jax.nn.relu(h))
        return x + h


class DPTHead(nn.Module):
    """Reassemble 4 token maps to multi-scale features, fuse top-down."""

    feat: int = FEAT_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_maps: Sequence[jax.Array], grid):
        gh, gw = grid
        # per-level projection + resample to (x4, x2, x1, x0.5) of grid
        scales = (4, 2, 1, 0.5)
        chans = (48, 96, 192, 384)
        feats = []
        for i, t in enumerate(token_maps):
            B = t.shape[0]
            f = t.reshape(B, gh, gw, WIDTH)
            f = nn.Conv(chans[i], (1, 1), dtype=self.dtype,
                        name=f"proj_{i}")(f)
            s = scales[i]
            nh, nw = int(gh * s), int(gw * s)
            f = jax.image.resize(f, (B, nh, nw, chans[i]), method="bilinear")
            f = nn.Conv(self.feat, (3, 3), dtype=self.dtype,
                        name=f"layer_rn_{i}")(f)
            feats.append(f)
        # top-down fusion
        x = ResidualConvUnit(dtype=self.dtype, name="rcu_3")(feats[3])
        for i in (2, 1, 0):
            B, h, w, c = feats[i].shape
            x = jax.image.resize(x, (B, h, w, c), method="bilinear")
            x = x + ResidualConvUnit(dtype=self.dtype, name=f"rcu_{i}")(feats[i])
            x = nn.Conv(self.feat, (1, 1), dtype=self.dtype,
                        name=f"fuse_out_{i}")(x)
        # output head: upsample x2 twice -> conv -> relu -> conv -> disparity
        B, h, w, c = x.shape
        x = jax.image.resize(x, (B, h * 2, w * 2, c), method="bilinear")
        x = nn.Conv(self.feat // 2, (3, 3), dtype=self.dtype, name="out_conv1")(x)
        x = jax.image.resize(x, (B, h * 4, w * 4, self.feat // 2),
                             method="bilinear")
        x = nn.Conv(32, (3, 3), dtype=self.dtype, name="out_conv2")(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="out_conv3")(
            jax.nn.relu(x))
        return jax.nn.relu(x[..., 0])  # raw disparity >= 0


class DepthAnythingV2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images (B, 3, H, W) in [-1, 1] -> normalized disparity (B, 1, H, W)."""
        B, _, H, W = images.shape
        x = jnp.moveaxis(images, 1, -1) * 0.5 + 0.5  # [0,1]
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        # pad to a multiple of the patch size
        ph = -H % PATCH
        pw = -W % PATCH
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        outs, grid = DINOv2Small(dtype=self.dtype, name="backbone")(x)
        disp = DPTHead(dtype=self.dtype, name="head")(outs, grid)
        disp = jax.image.resize(disp, (B, H + ph, W + pw),
                                method="bilinear")[:, :H, :W]
        # per-image min-max normalization to [0, 1]
        lo = disp.min(axis=(1, 2), keepdims=True)
        hi = disp.max(axis=(1, 2), keepdims=True)
        disp = (disp - lo) / jnp.maximum(hi - lo, 1e-6)
        return disp[:, None]


def make_depth_fn(key: jax.Array | None = None,
                  weights_path: str | None = None, dtype=jnp.float32):
    """Build ``depth_fn(images (B,N,3,H,W)) -> disparity (B,N,1,H,W)``."""
    model = DepthAnythingV2(dtype=dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 3, 56, 56)))
    if weights_path:
        params = load_torch_da2_weights(weights_path, params)

    def depth_fn(images):
        B, N = images.shape[:2]
        flat = images.reshape((B * N,) + images.shape[2:])
        disp = model.apply(params, flat)
        return disp.reshape((B, N) + disp.shape[1:])

    return depth_fn


def load_torch_da2_weights(path: str, params):
    """Convert the published DepthAnything-V2-Small torch checkpoint.

    Key mapping: ``pretrained.blocks.<i>.*`` -> backbone blocks,
    ``depth_head.*`` -> DPT head. Raises KeyError listing any unmapped
    tensors so conversion gaps are loud, not silent.
    """
    from ..checkpoint import load_torch_state_dict, t_conv, t_linear

    sd = load_torch_state_dict(path)
    p = jax.tree.map(np.asarray, params)
    bb = p["params"]["backbone"]
    direct = {
        "pretrained.cls_token": ("cls_token", None),
        "pretrained.pos_embed": ("pos_embed", None),
    }
    for tk, (ours, tf) in direct.items():
        if tk in sd:
            bb[ours] = sd[tk].reshape(bb[ours].shape)
    if "pretrained.patch_embed.proj.weight" in sd:
        bb["patch_embed"]["kernel"] = t_conv(
            sd["pretrained.patch_embed.proj.weight"])
        bb["patch_embed"]["bias"] = sd["pretrained.patch_embed.proj.bias"]
    for i in range(LAYERS):
        src = f"pretrained.blocks.{i}"
        dst = bb.get(f"block_{i}")
        if dst is None or f"{src}.attn.qkv.weight" not in sd:
            continue
        dst["qkv"]["kernel"] = t_linear(sd[f"{src}.attn.qkv.weight"])
        dst["qkv"]["bias"] = sd[f"{src}.attn.qkv.bias"]
        dst["proj"]["kernel"] = t_linear(sd[f"{src}.attn.proj.weight"])
        dst["proj"]["bias"] = sd[f"{src}.attn.proj.bias"]
        dst["norm1"]["scale"] = sd[f"{src}.norm1.weight"]
        dst["norm1"]["bias"] = sd[f"{src}.norm1.bias"]
        dst["norm2"]["scale"] = sd[f"{src}.norm2.weight"]
        dst["norm2"]["bias"] = sd[f"{src}.norm2.bias"]
        dst["mlp_fc1"]["kernel"] = t_linear(sd[f"{src}.mlp.fc1.weight"])
        dst["mlp_fc1"]["bias"] = sd[f"{src}.mlp.fc1.bias"]
        dst["mlp_fc2"]["kernel"] = t_linear(sd[f"{src}.mlp.fc2.weight"])
        dst["mlp_fc2"]["bias"] = sd[f"{src}.mlp.fc2.bias"]
        dst["ls1"] = sd[f"{src}.ls1.gamma"]
        dst["ls2"] = sd[f"{src}.ls2.gamma"]
    return jax.tree.map(jnp.asarray, p)
