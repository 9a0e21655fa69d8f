"""DepthAnything-V2 (Small): monocular relative-depth teacher in flax.

Replaces the reference's frozen depth teacher — transformers'
``DepthAnythingForDepthEstimation`` loaded from
``Depth-Anything-V2-Small-hf`` (``base_system.py:164-169,362-381``) — with a
weight-compatible flax implementation: DINOv2 ViT-S/14 backbone (fused-qkv
blocks with layer scale, shared final norm on each tapped layer) feeding the
DPT-style neck (reassemble with conv-transpose resizes, 3x3 no-bias convs,
top-down feature fusion with pre-act residual units and align-corners
bilinear upsampling) and the 3-conv relative-depth head.

``load_hf_da2_weights`` converts the HF torch state dict (verified
numerically against ``transformers.DepthAnythingForDepthEstimation`` in
``tests/test_reference_parity.py``). Random init keeps the training pipeline
executable offline (pseudo-depth is then uninformative but well-formed).

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

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def resize_bilinear_ac(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with torch ``align_corners=True`` semantics, NHWC.

    (jax.image.resize implements half-pixel centers = align_corners=False;
    the HF DPT fusion/head interpolations are align_corners=True.)
    """
    B, H, W, C = x.shape
    ys = jnp.linspace(0.0, H - 1.0, out_h) if out_h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, out_w) if out_w > 1 else jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ViTBlock(nn.Module):
    """DINOv2 block: pre-LN attention + layer-scale, pre-LN MLP + layer-scale."""

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
        ls1 = self.param("ls1", nn.initializers.ones, (c,))
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc1")(h)
        # DINOv2 hidden_act='gelu' is the exact erf form
        h = nn.Dense(c, dtype=self.dtype,
                     name="mlp_fc2")(jax.nn.gelu(h, approximate=False))
        ls2 = self.param("ls2", nn.initializers.ones, (c,))
        return x + h * ls2


class DINOv2(nn.Module):
    """Returns tapped hidden states (cls kept, shared final norm applied)."""

    width: int = 384
    layers: int = 12
    heads: int = 6
    patch: int = 14
    out_layers: Sequence[int] = (2, 5, 8, 11)
    native_grid: int = 37         # 518 / 14 pos-embed grid of the released ckpt
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) normalized
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        tok = nn.Conv(self.width, (self.patch, self.patch),
                      strides=(self.patch, self.patch), padding="VALID",
                      dtype=self.dtype, name="patch_embed")(x)
        tok = tok.reshape(B, gh * gw, self.width)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.native_grid**2 + 1, self.width))
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        native = int(np.sqrt(pos_patch.shape[1]))
        if (gh, gw) != (native, native):
            pos_patch = jax.image.resize(
                pos_patch.reshape(1, native, native, self.width),
                (1, gh, gw, self.width), method="bicubic")
        pos_patch = pos_patch.reshape(1, gh * gw, self.width)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)) + pos_cls,
             tok + pos_patch], axis=1)
        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        outs = []
        for i in range(self.layers):
            tokens = ViTBlock(self.heads, dtype=self.dtype,
                              name=f"block_{i}")(tokens)
            if i in self.out_layers:
                # HF Dinov2Backbone applies the SHARED final layernorm to
                # every tapped hidden state (apply_layernorm=True)
                outs.append(final_norm(tokens))
        return outs, (gh, gw)


class PreActResidualUnit(nn.Module):
    """relu-conv-relu-conv + skip (HF DepthAnythingPreActResidualLayer)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype,
                    name="conv1")(jax.nn.relu(x))
        h = nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype,
                    name="conv2")(jax.nn.relu(h))
        return x + h


class ReassembleLayer(nn.Module):
    """1x1 projection + factor-dependent resize (HF ReassembleLayer)."""

    channels: int
    factor: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f):  # (B, gh, gw, width)
        f = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name="projection")(f)
        if self.factor > 1:
            k = int(self.factor)
            # torch ConvTranspose2d(k, stride=k): transpose_kernel=True gives
            # the gradient-of-conv semantics torch uses
            f = nn.ConvTranspose(self.channels, (k, k), strides=(k, k),
                                 padding="VALID", transpose_kernel=True,
                                 dtype=self.dtype, name="resize")(f)
        elif self.factor < 1:
            s = int(round(1 / self.factor))
            f = nn.Conv(self.channels, (3, 3), strides=(s, s),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name="resize")(f)
        return f


class DPTNeckHead(nn.Module):
    """HF DepthAnything neck (reassemble + rn convs + fusion) and head."""

    fusion: int = 64
    head_hidden: int = 32
    neck_channels: Sequence[int] = (48, 96, 192, 384)
    factors: Sequence[float] = (4, 2, 1, 0.5)
    patch: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_maps: Sequence[jax.Array], grid):
        gh, gw = grid
        feats = []
        for i, t in enumerate(token_maps):
            B = t.shape[0]
            f = t[:, 1:].reshape(B, gh, gw, t.shape[-1])  # drop cls
            f = ReassembleLayer(self.neck_channels[i], self.factors[i],
                                dtype=self.dtype, name=f"reassemble_{i}")(f)
            f = nn.Conv(self.fusion, (3, 3), use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(f)
            feats.append(f)

        # fusion: reversed (deepest first); each layer: +rcu1(residual),
        # rcu2, align-corners x2 (or to the next feature's size), 1x1 proj
        x = None
        for idx, i in enumerate(reversed(range(len(feats)))):
            name = f"fusion_{i}"
            f = feats[i]
            if x is None:
                x = f
            else:
                x = x + PreActResidualUnit(dtype=self.dtype,
                                           name=f"{name}_rcu1")(f)
            x = PreActResidualUnit(dtype=self.dtype, name=f"{name}_rcu2")(x)
            if i > 0:
                nh, nw = feats[i - 1].shape[1:3]
            else:
                nh, nw = x.shape[1] * 2, x.shape[2] * 2
            x = resize_bilinear_ac(x, nh, nw)
            x = nn.Conv(self.fusion, (1, 1), dtype=self.dtype,
                        name=f"{name}_projection")(x)

        x = nn.Conv(self.fusion // 2, (3, 3), dtype=self.dtype,
                    name="head_conv1")(x)
        x = resize_bilinear_ac(x, gh * self.patch, gw * self.patch)
        x = nn.Conv(self.head_hidden, (3, 3), dtype=self.dtype,
                    name="head_conv2")(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype,
                    name="head_conv3")(jax.nn.relu(x))
        return jax.nn.relu(x[..., 0])  # relative depth (disparity) >= 0


class DepthAnythingV2(nn.Module):
    width: int = 384
    layers: int = 12
    heads: int = 6
    patch: int = 14
    out_layers: Sequence[int] = (2, 5, 8, 11)
    native_grid: int = 37
    fusion: int = 64
    head_hidden: int = 32
    neck_channels: Sequence[int] = (48, 96, 192, 384)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array,
                 normalize: bool = True) -> jax.Array:
        """images (B, 3, H, W) in [-1, 1] -> normalized disparity (B, 1, H, W)."""
        B, _, H, W = images.shape
        x = jnp.moveaxis(images, 1, -1) * 0.5 + 0.5  # [0,1]
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        # pad to a multiple of the patch size
        ph = -H % self.patch
        pw = -W % self.patch
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        outs, grid = DINOv2(width=self.width, layers=self.layers,
                            heads=self.heads, patch=self.patch,
                            out_layers=self.out_layers,
                            native_grid=self.native_grid,
                            dtype=self.dtype, name="backbone")(x)
        disp = DPTNeckHead(fusion=self.fusion, head_hidden=self.head_hidden,
                           neck_channels=self.neck_channels, patch=self.patch,
                           dtype=self.dtype, name="head")(outs, grid)
        if disp.shape[1:] != (H, W):
            disp = jax.image.resize(
                disp, (B, H + ph, W + pw), method="bilinear")[:, :H, :W]
        if not normalize:
            return disp[:, None]
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
        from ..checkpoint import load_torch_state_dict

        sd = load_torch_state_dict(weights_path)
        params, unmapped = load_hf_da2_weights(sd, params)
        if unmapped:
            raise KeyError(f"unmapped DepthAnything tensors: {unmapped[:10]} "
                           f"(+{max(0, len(unmapped) - 10)} more)")

    def depth_fn(images):
        B, N = images.shape[:2]
        flat = images.reshape((B * N,) + images.shape[2:])
        disp = model.apply(params, flat)
        return disp.reshape((B, N) + disp.shape[1:])

    return depth_fn


def load_hf_da2_weights(sd: dict, params):
    """Convert a transformers ``DepthAnythingForDepthEstimation`` state dict
    into the flax tree. Returns ``(params, unmapped_keys)`` (loud, not
    silent). Verified numerically in ``tests/test_reference_parity.py``."""
    from ..checkpoint import t_conv, t_linear

    p = jax.tree.map(np.asarray, params)
    root = p["params"]
    bb = root["backbone"]
    head = root["head"]
    used = set()

    def take(k):
        used.add(k)
        return sd[k]

    emb = "backbone.embeddings"
    bb["cls_token"] = take(f"{emb}.cls_token").reshape(bb["cls_token"].shape)
    bb["pos_embed"] = take(f"{emb}.position_embeddings").reshape(
        bb["pos_embed"].shape)
    bb["patch_embed"]["kernel"] = t_conv(
        take(f"{emb}.patch_embeddings.projection.weight"))
    bb["patch_embed"]["bias"] = take(f"{emb}.patch_embeddings.projection.bias")
    sd.get(f"{emb}.mask_token") is not None and used.add(f"{emb}.mask_token")

    n_layers = sum(1 for k in bb if k.startswith("block_"))
    for i in range(n_layers):
        src = f"backbone.encoder.layer.{i}"
        dst = bb[f"block_{i}"]
        qw = take(f"{src}.attention.attention.query.weight")
        kw = take(f"{src}.attention.attention.key.weight")
        vw = take(f"{src}.attention.attention.value.weight")
        dst["qkv"]["kernel"] = t_linear(np.concatenate([qw, kw, vw], 0))
        dst["qkv"]["bias"] = np.concatenate([
            take(f"{src}.attention.attention.query.bias"),
            take(f"{src}.attention.attention.key.bias"),
            take(f"{src}.attention.attention.value.bias")])
        dst["proj"]["kernel"] = t_linear(
            take(f"{src}.attention.output.dense.weight"))
        dst["proj"]["bias"] = take(f"{src}.attention.output.dense.bias")
        dst["norm1"]["scale"] = take(f"{src}.norm1.weight")
        dst["norm1"]["bias"] = take(f"{src}.norm1.bias")
        dst["norm2"]["scale"] = take(f"{src}.norm2.weight")
        dst["norm2"]["bias"] = take(f"{src}.norm2.bias")
        dst["mlp_fc1"]["kernel"] = t_linear(take(f"{src}.mlp.fc1.weight"))
        dst["mlp_fc1"]["bias"] = take(f"{src}.mlp.fc1.bias")
        dst["mlp_fc2"]["kernel"] = t_linear(take(f"{src}.mlp.fc2.weight"))
        dst["mlp_fc2"]["bias"] = take(f"{src}.mlp.fc2.bias")
        dst["ls1"] = take(f"{src}.layer_scale1.lambda1")
        dst["ls2"] = take(f"{src}.layer_scale2.lambda1")

    bb["norm"]["scale"] = take("backbone.layernorm.weight")
    bb["norm"]["bias"] = take("backbone.layernorm.bias")

    n_levels = sum(1 for k in head if k.startswith("reassemble_"))
    for i in range(n_levels):
        src = f"neck.reassemble_stage.layers.{i}"
        dst = head[f"reassemble_{i}"]
        dst["projection"]["kernel"] = t_conv(take(f"{src}.projection.weight"))
        dst["projection"]["bias"] = take(f"{src}.projection.bias")
        if f"{src}.resize.weight" in sd:
            w = take(f"{src}.resize.weight")
            if w.shape[2] == w.shape[3] and w.shape[2] in (2, 4):
                # ConvTranspose2d weight (ct_in, ct_out, kh, kw): flax
                # transpose_kernel=True takes the forward-conv layout of the
                # conv it is the gradient of -> (kh, kw, ct_out, ct_in)
                dst["resize"]["kernel"] = np.transpose(w, (2, 3, 1, 0))
            else:  # factor < 1: plain strided Conv2d
                dst["resize"]["kernel"] = t_conv(w)
            dst["resize"]["bias"] = take(f"{src}.resize.bias")
        head[f"conv_{i}"]["kernel"] = t_conv(
            take(f"neck.convs.{i}.weight"))
        fsrc = f"neck.fusion_stage.layers.{n_levels - 1 - i}"
        fdst_prefix = f"fusion_{i}"
        head[f"{fdst_prefix}_projection"]["kernel"] = t_conv(
            take(f"{fsrc}.projection.weight"))
        head[f"{fdst_prefix}_projection"]["bias"] = take(
            f"{fsrc}.projection.bias")
        for rcu, tname in (("rcu1", "residual_layer1"),
                           ("rcu2", "residual_layer2")):
            key = f"{fdst_prefix}_{rcu}"
            if key not in head:
                used.update(k for k in sd if k.startswith(f"{fsrc}.{tname}."))
                continue
            for cj in (1, 2):
                head[key][f"conv{cj}"]["kernel"] = t_conv(
                    take(f"{fsrc}.{tname}.convolution{cj}.weight"))
                head[key][f"conv{cj}"]["bias"] = take(
                    f"{fsrc}.{tname}.convolution{cj}.bias")

    head["head_conv1"]["kernel"] = t_conv(take("head.conv1.weight"))
    head["head_conv1"]["bias"] = take("head.conv1.bias")
    head["head_conv2"]["kernel"] = t_conv(take("head.conv2.weight"))
    head["head_conv2"]["bias"] = take("head.conv2.bias")
    head["head_conv3"]["kernel"] = t_conv(take("head.conv3.weight"))
    head["head_conv3"]["bias"] = take("head.conv3.bias")

    unmapped = [k for k in sd if k not in used
                and "mask_token" not in k and "position_ids" not in k]
    return jax.tree.map(jnp.asarray, p), unmapped
