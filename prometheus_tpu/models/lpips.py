"""LPIPS perceptual distance (VGG16 backbone) in flax.

Replaces the reference's ``lpips`` package dependency
(``base_system.py:161-169``, used by the stage-1 rendering loss and eval).
Architecture parity: VGG16 conv features at relu1_2/2_2/3_3/4_3/5_3,
channel-unit-normalization, learned 1x1 linear heads, spatial + layer mean.

Pretrained VGG16 + LPIPS linear weights load via
``load_torch_lpips_weights`` when a checkpoint file is available; with random
init this is still a valid perceptual-style distance (random-feature LPIPS
correlates with human judgment far better than L2 — Zhang et al. 2018 §5),
so training code works offline and tightens when real weights are converted.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (out_channels, num_convs) per block
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# ImageNet normalization (LPIPS 'scaling layer' equivalent)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 feature trunk; returns the 5 post-ReLU block outputs."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3), already LPIPS-scaled
        feats = []
        for b, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), dtype=self.dtype,
                            name=f"block{b + 1}_conv{c + 1}")(x)
                x = jax.nn.relu(x)
            feats.append(x)
            if b < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips(pred, target) over images in [-1, 1], NCHW."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        def prep(x):
            x = jnp.moveaxis(x, 1, -1)  # NHWC
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        f_pred = vgg(prep(pred))
        f_tgt = vgg(prep(target))
        total = 0.0
        for i, (a, b) in enumerate(zip(f_pred, f_tgt)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            diff = (a - b) ** 2
            # learned 1x1 head: lpips's ``lin`` is sum_c w_c * diff_c (NO
            # channel mean) — random init uses 1/C so untrained layer
            # contributions stay balanced. Official weights are non-negative
            # (relu is then a no-op); the projection keeps the head a valid
            # distance if this flax module is ever trained from scratch.
            w = self.param(
                f"lin{i}",
                nn.initializers.constant(1.0 / diff.shape[-1]),
                (diff.shape[-1],))
            w = jax.nn.relu(w)
            contrib = jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
            total = total + contrib
        return jnp.mean(total)


def make_lpips_fn(key: jax.Array | None = None, weights_path: str | None = None,
                  dtype=jnp.float32):
    """Build ``lpips(pred, target) -> scalar`` with weights baked in."""
    model = LPIPS(dtype=dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 3, 64, 64))
    params = model.init(key, dummy, dummy)
    if weights_path:
        params = load_torch_lpips_weights(weights_path, params)

    def lpips_fn(pred, target):
        # accepts (B, 3, H, W) or (B, N, 3, H, W)
        if pred.ndim == 5:
            pred = pred.reshape((-1,) + pred.shape[2:])
            target = target.reshape((-1,) + target.shape[2:])
        return model.apply(params, pred, target)

    return lpips_fn


def load_torch_lpips_weights(path: str, params):
    """Convert a torch LPIPS(+VGG16) checkpoint into this module's params.

    Expects a dict with torchvision-style ``features.<i>.weight`` conv keys
    and lpips-style ``lin<k>.model.1.weight`` head keys.
    """
    from ..checkpoint import load_torch_state_dict, t_conv

    sd = load_torch_state_dict(path)
    p = jax.tree.map(np.asarray, params)
    # torchvision VGG16 conv indices within `features`
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    names = [f"block{b + 1}_conv{c + 1}"
             for b, (_, n) in enumerate(_VGG_BLOCKS) for c in range(n)]
    for idx, name in zip(conv_idx, names):
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        for cand_w, cand_b in ((wk, bk), (f"net.{wk}", f"net.{bk}")):
            if cand_w in sd:
                p["params"]["vgg"][name]["kernel"] = t_conv(sd[cand_w])
                p["params"]["vgg"][name]["bias"] = sd[cand_b]
                break
    for k in range(5):
        for cand in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if cand in sd:
                p["params"][f"lin{k}"] = sd[cand].reshape(-1)
                break
    return jax.tree.map(jnp.asarray, p)
