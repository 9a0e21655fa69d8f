"""Structural validation of the torch->flax weight maps: synthesize a
torch-style state dict FROM flax params via the inverse transforms, convert
it back through the mapping tables, and require an exact round-trip. This
proves the name/shape tables are correct without needing real weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.models import AutoencoderKL, CLIPTextModel, MultiViewUNet
from prometheus_tpu.weight_maps import (
    apply_weight_map,
    map_clip_text,
    map_ldm_unet,
    map_ldm_vae,
)


def synthesize_torch_sd(params: dict, pairs) -> dict:
    """Build {torch_key: tensor} from a flax tree using inverse transforms."""
    def get(tree, dotted):
        cur = tree
        for p in dotted.split("/"):
            if p not in cur:
                return None
            cur = cur[p]
        return np.asarray(cur)

    sd = {}
    for src, dst, kind in pairs:
        if kind == "conv":
            k = get(params, f"{dst}/kernel")
            if k is None:
                continue
            sd[f"{src}.weight"] = np.transpose(k, (3, 2, 0, 1))
            b = get(params, f"{dst}/bias")
            if b is not None:
                sd[f"{src}.bias"] = b
        elif kind == "attn1x1":
            k = get(params, f"{dst}/kernel")
            if k is None:
                continue
            sd[f"{src}.weight"] = k.T.reshape(k.shape[1], k.shape[0], 1, 1)
            b = get(params, f"{dst}/bias")
            if b is not None:
                sd[f"{src}.bias"] = b
        elif kind in ("linear", "linear_nb"):
            k = get(params, f"{dst}/kernel")
            if k is None:
                continue
            sd[f"{src}.weight"] = k.T
            b = get(params, f"{dst}/bias")
            if kind == "linear" and b is not None:
                sd[f"{src}.bias"] = b
        elif kind in ("norm", "ln"):
            s = get(params, f"{dst}/scale")
            if s is None:
                continue
            sd[f"{src}.weight"] = s
            b = get(params, f"{dst}/bias")
            if b is not None:
                sd[f"{src}.bias"] = b
        elif kind == "embed":
            e = get(params, f"{dst}/embedding")
            if e is not None:
                sd[f"{src}.weight"] = e
        elif kind == "embed_raw":
            e = get(params, dst)
            if e is not None:
                sd[f"{src}.weight"] = e
    return sd


def roundtrip(params: dict, pairs):
    pairs = list(pairs)
    sd = synthesize_torch_sd(params, pairs)
    # fresh tree of zeros to convert into
    zeros = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    mapped, missing, unassigned = apply_weight_map(sd, pairs, zeros)
    assert unassigned == [], unassigned
    return zeros, mapped, missing, sd


def assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    for k, v in fa:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(fb[jax.tree_util.keystr(k)]),
            atol=0, err_msg=jax.tree_util.keystr(k))


def test_unet_weight_map_roundtrip(key):
    unet = MultiViewUNet(in_channels=8, out_channels=8, model_channels=32,
                         num_head_channels=16, context_dim=64,
                         channel_mult=(1, 2), num_res_blocks=1,
                         attention_ds=(1,),
                         disable_3d_attentions=(0, 0, 0),
                         use_checkpoint=False)
    v = unet.init(key, jnp.zeros((1, 8, 16, 16)), jnp.zeros((1,)),
                  jnp.zeros((1, 7, 64)), num_frames=1)
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_ldm_unet(num_levels=2, num_res_blocks=1,
                              attention_levels=(0,)))
    out, mapped, missing, sd = roundtrip(params, pairs)
    # every mapping entry whose destination exists must have been synthesized
    # and mapped back exactly
    assert mapped > 40
    assert_trees_equal(out, params)
    # skip_connection only exists where channels change; middle/level maps
    # that hit no destination are fine, but nothing real may be missing:
    real_missing = [m for m in missing if "skip" not in m]
    assert real_missing == [], real_missing


def test_vae_weight_map_roundtrip(key):
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    v = vae.init(key, jnp.zeros((1, 3, 32, 32)), sample_posterior=False)
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_ldm_vae(num_levels=2, num_res_blocks=1))
    out, mapped, missing, sd = roundtrip(params, pairs)
    assert mapped > 30
    assert_trees_equal(out, params)
    real_missing = [m for m in missing if "nin_shortcut" not in m]
    assert real_missing == [], real_missing


def test_raydiff_dit_weight_map_roundtrip(key):
    from prometheus_tpu.models import CrossViewDiTWrapped
    from prometheus_tpu.weight_maps import map_raydiff_dit

    dit = CrossViewDiTWrapped(latent_channels=14, dit_channels=32,
                              hidden_size=64, depth=2, num_heads=4)
    v = dit.init(key, jnp.zeros((1, 2, 14, 16, 16)))
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_raydiff_dit(depth=2))
    out, mapped, missing, sd = roundtrip(params, pairs)
    assert mapped > 10
    assert_trees_equal(out, params)
    assert missing == [], missing


def test_clip_weight_map_roundtrip(key):
    clip = CLIPTextModel(width=64, num_heads=4, num_layers=2, vocab_size=100)
    v = clip.init(key, jnp.zeros((1, 77), jnp.int32))
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_clip_text(num_layers=2))
    out, mapped, missing, sd = roundtrip(params, pairs)
    assert mapped > 15
    assert_trees_equal(out, params)
    assert missing == [], missing
