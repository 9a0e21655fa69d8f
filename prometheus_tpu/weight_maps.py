"""Torch->flax weight-name mapping tables for the pretrained towers.

Covers the reference's checkpoint formats (SURVEY.md hard part #2):
- LDM-style SD U-Net (``model.diffusion_model.*`` / the unet_hacked state
  dict): input/middle/output blocks -> our ``down_*/mid_*/up_*`` names.
- LDM VAE (``first_stage_model.*``): encoder/decoder resnet+attn stacks.
- transformers CLIPTextModel (``text_model.*``).

Each ``map_*`` function yields ``(torch_key, flax_path, transform)`` with
``transform`` in {"conv", "linear", "none", "attn1x1"}; ``apply_weight_map``
assigns into a flax param tree and returns the unmapped keys (loud, not
silent). The MV-LDM channel-padding surgery (4->15 conv in/out) composes on
top via ``checkpoint.pad_conv_*``.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np


# ---------------------------------------------------------------------------
# U-Net (LDM naming), channel_mult levels L with R res blocks each
# ---------------------------------------------------------------------------

def map_ldm_unet(num_levels: int = 4, num_res_blocks: int = 2,
                 attention_levels=(0, 1, 2)) -> Iterator[tuple]:
    def res_pairs(src: str, dst: str):
        yield f"{src}.in_layers.0", f"{dst}/in_norm/GroupNorm_0", "norm"
        yield f"{src}.in_layers.2", f"{dst}/in_conv", "conv"
        yield f"{src}.emb_layers.1", f"{dst}/emb_proj", "linear"
        yield f"{src}.out_layers.0", f"{dst}/out_norm/GroupNorm_0", "norm"
        yield f"{src}.out_layers.3", f"{dst}/out_conv", "conv"
        yield f"{src}.skip_connection", f"{dst}/skip", "conv"

    def attn_pairs(src: str, dst: str):
        yield f"{src}.norm", f"{dst}/norm/GroupNorm_0", "norm"
        yield f"{src}.proj_in", f"{dst}/proj_in", "linear"
        tb = f"{src}.transformer_blocks.0"
        db = f"{dst}/block_0"
        for a in ("attn1", "attn2"):
            yield f"{tb}.{a}.to_q", f"{db}/{a}/to_q", "linear_nb"
            yield f"{tb}.{a}.to_k", f"{db}/{a}/to_k", "linear_nb"
            yield f"{tb}.{a}.to_v", f"{db}/{a}/to_v", "linear_nb"
            yield f"{tb}.{a}.to_out.0", f"{db}/{a}/to_out", "linear"
        for n in ("norm1", "norm2", "norm3"):
            yield f"{tb}.{n}", f"{db}/{n}", "ln"
        yield f"{tb}.ff.net.0.proj", f"{db}/ff_geglu/proj", "linear"
        yield f"{tb}.ff.net.2", f"{db}/ff_out", "linear"
        yield f"{src}.proj_out", f"{dst}/proj_out", "linear"

    yield "time_embed.0", "time_embed/fc1", "linear"
    yield "time_embed.2", "time_embed/fc2", "linear"
    yield "input_blocks.0.0", "conv_in", "conv"

    idx = 1
    for level in range(num_levels):
        for j in range(num_res_blocks):
            yield from res_pairs(f"input_blocks.{idx}.0",
                                 f"down_{level}_res_{j}")
            if level in attention_levels:
                yield from attn_pairs(f"input_blocks.{idx}.1",
                                      f"down_{level}_attn_{j}")
            idx += 1
        if level != num_levels - 1:
            yield (f"input_blocks.{idx}.0.op",
                   f"down_{level}_downsample/conv", "conv")
            idx += 1

    yield from res_pairs("middle_block.0", "mid_res_1")
    yield from attn_pairs("middle_block.1", "mid_attn")
    yield from res_pairs("middle_block.2", "mid_res_2")

    idx = 0
    for level in reversed(range(num_levels)):
        for j in range(num_res_blocks + 1):
            yield from res_pairs(f"output_blocks.{idx}.0",
                                 f"up_{level}_res_{j}")
            sub = 1
            if level in attention_levels:
                yield from attn_pairs(f"output_blocks.{idx}.1",
                                      f"up_{level}_attn_{j}")
                sub = 2
            if j == num_res_blocks and level != 0:
                yield (f"output_blocks.{idx}.{sub}.conv",
                       f"up_{level}_upsample/conv", "conv")
            idx += 1

    yield "out.0", "out_norm/GroupNorm_0", "norm"
    yield "out.2", "conv_out", "conv"


# ---------------------------------------------------------------------------
# VAE (LDM naming)
# ---------------------------------------------------------------------------

def map_ldm_vae(num_levels: int = 4, num_res_blocks: int = 2,
                which: str = "both") -> Iterator[tuple]:
    def res_pairs(src: str, dst: str):
        yield f"{src}.norm1", f"{dst}/norm1/GroupNorm_0", "norm"
        yield f"{src}.conv1", f"{dst}/conv1/Conv_0", "conv"
        yield f"{src}.norm2", f"{dst}/norm2/GroupNorm_0", "norm"
        yield f"{src}.conv2", f"{dst}/conv2/Conv_0", "conv"
        yield f"{src}.nin_shortcut", f"{dst}/nin_shortcut/Conv_0", "conv"

    def attn_pairs(src: str, dst: str):
        yield f"{src}.norm", f"{dst}/norm/GroupNorm_0", "norm"
        for t in ("q", "k", "v", "proj_out"):
            yield f"{src}.{t}", f"{dst}/{t}", "attn1x1"

    if which in ("both", "encoder"):
        yield "encoder.conv_in", "encoder/conv_in/Conv_0", "conv"
        for lvl in range(num_levels):
            for j in range(num_res_blocks):
                yield from res_pairs(f"encoder.down.{lvl}.block.{j}",
                                     f"encoder/down_{lvl}_block_{j}")
            if lvl != num_levels - 1:
                yield (f"encoder.down.{lvl}.downsample.conv",
                       f"encoder/down_{lvl}_downsample/conv", "conv")
        yield from res_pairs("encoder.mid.block_1", "encoder/mid_block_1")
        yield from attn_pairs("encoder.mid.attn_1", "encoder/mid_attn_1")
        yield from res_pairs("encoder.mid.block_2", "encoder/mid_block_2")
        yield "encoder.norm_out", "encoder/norm_out/GroupNorm_0", "norm"
        yield "encoder.conv_out", "encoder/conv_out/Conv_0", "conv"
        yield "quant_conv", "quant_conv", "conv"

    if which in ("both", "decoder"):
        yield "post_quant_conv", "post_quant_conv", "conv"
        yield "decoder.conv_in", "decoder/conv_in/Conv_0", "conv"
        yield from res_pairs("decoder.mid.block_1", "decoder/mid_block_1")
        yield from attn_pairs("decoder.mid.attn_1", "decoder/mid_attn_1")
        yield from res_pairs("decoder.mid.block_2", "decoder/mid_block_2")
        for lvl in range(num_levels):  # decoder counts up.{L} top-down
            for j in range(num_res_blocks + 1):
                yield from res_pairs(f"decoder.up.{lvl}.block.{j}",
                                     f"decoder/up_{lvl}_block_{j}")
            if lvl != 0:
                yield (f"decoder.up.{lvl}.upsample.conv",
                       f"decoder/up_{lvl}_upsample/conv/Conv_0", "conv")
        yield "decoder.norm_out", "decoder/norm_out/GroupNorm_0", "norm"
        yield "decoder.conv_out", "decoder/conv_out/Conv_0", "conv"


# ---------------------------------------------------------------------------
# Cross-view DiT (raydiff naming, reference modules/ray_diff.py + the
# GSDecoder conv_in/conv_out wrappers from models/gs_decoder.py)
# ---------------------------------------------------------------------------

def map_raydiff_dit(depth: int = 16) -> Iterator[tuple]:
    yield "conv_in.conv", "conv_in/conv", "conv"
    yield "conv_out.conv", "conv_out/conv/Conv_0", "conv"
    yield "x_embedder.proj", "dit/x_embedder", "conv"
    yield "t_embedder.mlp.0", "dit/t_embedder/fc1", "linear"
    yield "t_embedder.mlp.2", "dit/t_embedder/fc2", "linear"
    for i in range(depth):
        src, dst = f"blocks.{i}", f"dit/block_{i}"
        yield f"{src}.adaLN_modulation.1", f"{dst}/adaLN_modulation", "linear"
        yield f"{src}.attn.qkv", f"{dst}/attn/qkv", "linear"
        yield f"{src}.attn.proj", f"{dst}/attn/proj", "linear"
        yield f"{src}.mlp.fc1", f"{dst}/mlp/fc1", "linear"
        yield f"{src}.mlp.fc2", f"{dst}/mlp/fc2", "linear"
    yield ("final_layer.adaLN_modulation.1",
           "dit/final_layer/adaLN_modulation", "linear")
    yield "final_layer.linear", "dit/final_layer/linear", "linear"


# ---------------------------------------------------------------------------
# CLIP text tower (transformers naming)
# ---------------------------------------------------------------------------

def map_clip_text(num_layers: int = 23) -> Iterator[tuple]:
    yield ("text_model.embeddings.token_embedding",
           "token_embedding", "embed")
    yield ("text_model.embeddings.position_embedding",
           "position_embedding", "embed_raw")
    for i in range(num_layers):
        src = f"text_model.encoder.layers.{i}"
        dst = f"layer_{i}"
        for t in ("q_proj", "k_proj", "v_proj", "out_proj"):
            yield f"{src}.self_attn.{t}", f"{dst}/attn/{t}", "linear"
        yield f"{src}.layer_norm1", f"{dst}/ln1", "ln"
        yield f"{src}.layer_norm2", f"{dst}/ln2", "ln"
        yield f"{src}.mlp.fc1", f"{dst}/mlp/fc1", "linear"
        yield f"{src}.mlp.fc2", f"{dst}/mlp/fc2", "linear"
    yield "text_model.final_layer_norm", "final_ln", "ln"


# ---------------------------------------------------------------------------
# CLIP vision tower (transformers CLIPVisionModelWithProjection naming;
# reference mv_ldm.py:72-82 loads it for the image-to-3D task)
# ---------------------------------------------------------------------------

def map_clip_vision(num_layers: int = 32) -> Iterator[tuple]:
    emb = "vision_model.embeddings"
    yield f"{emb}.patch_embedding", "patch_embed", "conv"
    yield f"{emb}.class_embedding", "class_embedding", "raw"
    yield f"{emb}.position_embedding", "position_embedding", "embed_raw"
    # transformers' attribute really is spelled "pre_layrnorm"
    yield "vision_model.pre_layrnorm", "pre_ln", "ln"
    for i in range(num_layers):
        src = f"vision_model.encoder.layers.{i}"
        dst = f"layer_{i}"
        for t in ("q_proj", "k_proj", "v_proj", "out_proj"):
            yield f"{src}.self_attn.{t}", f"{dst}/{t}", "linear"
        yield f"{src}.layer_norm1", f"{dst}/ln1", "ln"
        yield f"{src}.layer_norm2", f"{dst}/ln2", "ln"
        yield f"{src}.mlp.fc1", f"{dst}/fc1", "linear"
        yield f"{src}.mlp.fc2", f"{dst}/fc2", "linear"
    yield "vision_model.post_layernorm", "post_ln", "ln"
    yield "visual_projection", "visual_projection", "linear_nb"


# ---------------------------------------------------------------------------
# Generic applier
# ---------------------------------------------------------------------------

def _path_exists(params: dict, dotted: str) -> bool:
    cur = params
    for p in dotted.split("/"):
        if not isinstance(cur, dict) or p not in cur:
            return False
        cur = cur[p]
    return True


def expected_torch_keys(pairs) -> set[str]:
    """All torch state-dict keys a mapping table can consume (for coverage
    checks: ``sd.keys() - expected_torch_keys(pairs)`` should be empty)."""
    keys = set()
    for src, _dst, kind in pairs:
        if kind == "raw":
            keys.add(src)
        else:
            keys.add(f"{src}.weight")
            keys.add(f"{src}.bias")
    return keys


def apply_weight_map(sd: dict, pairs, params: dict,
                     prefix: str = "") -> tuple[int, list[str], list[str]]:
    """Assign torch tensors into the flax tree.

    Returns ``(n_mapped, missing, unassigned)``: ``missing`` lists entries
    whose source tensor was absent while the destination exists (gaps in the
    checkpoint), ``unassigned`` lists entries whose source exists but the
    destination path does not (gaps in the flax tree / table bugs). Both
    should be empty for a verified conversion.
    """
    from .checkpoint import assign_into, t_conv, t_linear

    mapped, missing, unassigned = 0, [], []
    for src, dst, kind in pairs:
        dst = prefix + dst

        def put(path, value):
            nonlocal mapped
            if assign_into(params, path, value):
                mapped += 1
                return True
            unassigned.append(path)
            return False

        if kind in ("conv", "attn1x1"):
            wk, bk = f"{src}.weight", f"{src}.bias"
            if wk not in sd:
                if _path_exists(params, f"{dst}/kernel"):
                    missing.append(src)
                continue
            w = sd[wk]
            if kind == "attn1x1":   # 1x1 conv consumed by a Dense layer
                put(f"{dst}/kernel", w.reshape(w.shape[0], w.shape[1]).T)
            else:
                put(f"{dst}/kernel", t_conv(w))
            if bk in sd:
                put(f"{dst}/bias", sd[bk])
        elif kind in ("linear", "linear_nb"):
            wk = f"{src}.weight"
            if wk not in sd:
                if _path_exists(params, f"{dst}/kernel"):
                    missing.append(src)
                continue
            put(f"{dst}/kernel", t_linear(sd[wk]))
            if kind == "linear" and f"{src}.bias" in sd:
                put(f"{dst}/bias", sd[f"{src}.bias"])
        elif kind in ("norm", "ln"):
            wk = f"{src}.weight"
            if wk not in sd:
                if _path_exists(params, f"{dst}/scale"):
                    missing.append(src)
                continue
            put(f"{dst}/scale", sd[wk])
            if f"{src}.bias" in sd:
                put(f"{dst}/bias", sd[f"{src}.bias"])
        elif kind == "embed":
            wk = f"{src}.weight"
            if wk not in sd:
                if _path_exists(params, f"{dst}/embedding"):
                    missing.append(src)
                continue
            put(f"{dst}/embedding", sd[wk])
        elif kind == "embed_raw":
            wk = f"{src}.weight"
            if wk not in sd:
                if _path_exists(params, dst):
                    missing.append(src)
                continue
            put(dst, sd[wk])
        elif kind == "raw":     # bare tensor (no .weight suffix), verbatim
            if src not in sd:
                if _path_exists(params, dst):
                    missing.append(src)
                continue
            put(dst, sd[src])
        else:
            raise ValueError(kind)
    return mapped, missing, unassigned
