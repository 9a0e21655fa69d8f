"""Checkpointing: Orbax save/resume + published-torch-checkpoint conversion.

Replaces the reference's Lightning ModelCheckpoint + resume-latest scan
(``base_system.py:92-150``) and the ``full.ckpt`` bundle loader
(``inference.py:88-128``, bundle layout from ``tools/create_finalckpt.py``:
``{'traj': state_dict, 'decoder': {'state_dict': ...}, 'mvldm':
{'state_dict': ...}}``). Torch tensors are converted to numpy pytrees with
key remapping tables per tower; torch is used purely as a pickle reader (CPU).
"""
from __future__ import annotations

import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax train-state checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 3):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:09d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state))
    _prune_checkpoints(ckpt_dir, keep)
    return path


def _prune_checkpoints(ckpt_dir: str, keep: int):
    steps = sorted(list_checkpoints(ckpt_dir))
    for s in steps[:-keep] if keep > 0 else []:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s:09d}"),
                      ignore_errors=True)


def list_checkpoints(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Resume-latest semantics (step-number scan, base_system.py:120-150)."""
    steps = list_checkpoints(ckpt_dir)
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{steps[-1]:09d}")


def restore_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(os.path.abspath(path),
                                 item=jax.tree.map(np.asarray, target))
        return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# Torch checkpoint reading / conversion
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str, key: str | None = None) -> dict:
    """Load a torch checkpoint into {name: np.ndarray} (CPU, pickle only)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        blob = blob[key]
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    out = {}
    for k, v in blob.items():
        if hasattr(v, "numpy"):
            out[k] = v.float().numpy() if v.dtype.is_floating_point \
                else v.numpy()
    return out


def split_full_ckpt(path: str) -> dict[str, dict]:
    """Split the published ``full.ckpt`` bundle into per-tower state dicts."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    towers = {}
    for name in ("traj", "decoder", "mvldm"):
        sub = blob[name]
        if isinstance(sub, dict) and "state_dict" in sub:
            sub = sub["state_dict"]
        towers[name] = {
            k: (v.float().numpy() if hasattr(v, "numpy")
                and v.dtype.is_floating_point else np.asarray(v))
            for k, v in sub.items()
            if hasattr(v, "numpy")
        }
    return towers


# -- torch -> flax weight transforms ----------------------------------------

def t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def t_linear(w: np.ndarray) -> np.ndarray:
    """torch linear (O, I) -> flax (I, O)."""
    return w.T


def assign_into(params: dict, dotted: str, value: np.ndarray,
                strict_shape: bool = True) -> bool:
    """Set ``params['a']['b']...`` = value; returns False if path missing."""
    parts = dotted.split("/")
    cur = params
    for p in parts[:-1]:
        if p not in cur:
            return False
        cur = cur[p]
    leaf = parts[-1]
    if leaf not in cur:
        return False
    if strict_shape and tuple(cur[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {dotted}: {cur[leaf].shape} vs {value.shape}")
    cur[leaf] = jnp.asarray(value, cur[leaf].dtype) \
        if isinstance(cur[leaf], jax.Array) else value.astype(cur[leaf].dtype)
    return True


# ---------------------------------------------------------------------------
# full.ckpt bundle conversion (reference tools/create_finalckpt.py layout)
# ---------------------------------------------------------------------------

def map_trajdit_key(k: str) -> str | None:
    """TrajDiT state-dict names -> our TrajDiTModel param paths."""
    table = {
        "in_block.weight": "in_block/kernel",
        "in_block.bias": "in_block/bias",
        "out_block.weight": "out_block/kernel",
        "out_block.bias": "out_block/bias",
        "pos_embed": "pos_embed",
        "y_embedder.weight": "y_embedder/kernel",
        "y_embedder.bias": "y_embedder/bias",
        "t_embedder.0.mlp.0.weight": "t_embedder/fc1/kernel",
        "t_embedder.0.mlp.0.bias": "t_embedder/fc1/bias",
        "t_embedder.0.mlp.2.weight": "t_embedder/fc2/kernel",
        "t_embedder.0.mlp.2.bias": "t_embedder/fc2/bias",
    }
    if k in table:
        return table[k]
    m = re.match(r"blocks\.(\d+)\.(.*)", k)
    if m:
        i, rest = m.group(1), m.group(2)
        sub = {
            "adaLN_modulation.0.weight": "adaLN_modulation/kernel",
            "adaLN_modulation.0.bias": "adaLN_modulation/bias",
            # reference dit.py CrossAttention names its projections q/k/v
            # (qkv_bias=True, dit.py:69-73)
            "cattn.q.weight": "cattn/to_q/kernel",
            "cattn.q.bias": "cattn/to_q/bias",
            "cattn.k.weight": "cattn/to_k/kernel",
            "cattn.k.bias": "cattn/to_k/bias",
            "cattn.v.weight": "cattn/to_v/kernel",
            "cattn.v.bias": "cattn/to_v/bias",
            "cattn.proj.weight": "cattn/proj/kernel",
            "cattn.proj.bias": "cattn/proj/bias",
            "sattn.qkv.weight": "sattn/qkv/kernel",
            "sattn.qkv.bias": "sattn/qkv/bias",
            "sattn.proj.weight": "sattn/proj/kernel",
            "sattn.proj.bias": "sattn/proj/bias",
            "mlp.fc1.weight": "mlp/fc1/kernel",
            "mlp.fc1.bias": "mlp/fc1/bias",
            "mlp.fc2.weight": "mlp/fc2/kernel",
            "mlp.fc2.bias": "mlp/fc2/bias",
        }.get(rest)
        if sub:
            return f"block_{i}/{sub}"
    return None


def convert_tower(sd: dict, mapper, params, prefix: str = ""):
    """Apply a key mapper; returns (mapped_count, unmapped_keys)."""
    mapped, unmapped = 0, []
    for k, v in sd.items():
        path = mapper(k)
        if path is None:
            unmapped.append(k)
            continue
        arr = np.asarray(v)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = t_conv(arr)
        elif k.endswith(".weight") and arr.ndim == 2:
            arr = t_linear(arr)
        if assign_into(params, prefix + path, arr, strict_shape=True):
            mapped += 1
        else:
            unmapped.append(k)
    return mapped, unmapped


def _strip_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _normalize_gs_vae_sd(sd: dict) -> tuple[dict, dict]:
    """Undo the reference's EMANorm Sequential wrapping
    (``gs_decoder.py:66-73``: upsample conv becomes ``conv.0`` and an
    ``conv.1.magnitude_ema`` buffer appears). Returns (renamed sd,
    {level: magnitude_ema})."""
    out, ema = {}, {}
    for k, v in sd.items():
        m = re.fullmatch(r"decoder\.up\.(\d+)\.upsample\.conv\.0\.(weight|bias)",
                         k)
        if m:
            out[f"decoder.up.{m.group(1)}.upsample.conv.{m.group(2)}"] = v
            continue
        m = re.fullmatch(r"decoder\.up\.(\d+)\.upsample\.conv\.1"
                         r"\.magnitude_ema", k)
        if m:
            ema[int(m.group(1))] = v
            continue
        out[k] = v
    return out, ema


def convert_bundle(towers: dict, pipe) -> dict:
    """Convert split ``full.ckpt`` towers into the pipeline's params IN PLACE.

    ``towers`` is ``split_full_ckpt(path)``; ``pipe`` a PrometheusPipeline.
    Returns a per-tower report: mapped counts plus ``missing`` (checkpoint
    gaps), ``unassigned`` (flax-tree gaps) and ``skipped`` (source keys
    outside the consumed prefixes, e.g. the frozen ``decoder_2d`` copy and
    loss-head params the bundle may carry) — loud, not silent.
    """
    from .weight_maps import (apply_weight_map, map_clip_text, map_ldm_unet,
                              map_ldm_vae, map_raydiff_dit)

    report: dict = {}

    traj_params = jax.tree.map(np.asarray, pipe.traj_params)
    mapped, unmapped = convert_tower(
        towers["traj"], map_trajdit_key, traj_params["params"])
    report["traj"] = {"mapped": mapped, "unmapped": unmapped}
    pipe.traj_params = traj_params

    # --- mvldm tower: model.unet.* / model.vae.* / model.text_encoder.* ----
    # (the trained bundle already has the padded 15-ch convs, mv_ldm.py:86-131
    # — no surgery needed at load time)
    mv_params = jax.tree.map(np.asarray, pipe.mvldm_params)
    mv_sd = towers["mvldm"]
    n_lv = len(pipe.mvldm.model.channel_mult)
    n_vae_lv = len(pipe.mvldm.model.vae_ch_mult)
    # MVLDMModel builds its U-Net with the default attention_ds (1, 2, 4)
    # (unet_mv.py:191) — attention everywhere except the deepest level(s)
    attn_levels = tuple(lv for lv in range(n_lv) if 2 ** lv in (1, 2, 4))
    m1, miss1, un1 = apply_weight_map(
        _strip_prefix(mv_sd, "model.unet."),
        map_ldm_unet(n_lv, pipe.mvldm.model.num_res_blocks,
                     attention_levels=attn_levels),
        mv_params["params"], prefix="unet/")
    m2, miss2, un2 = apply_weight_map(
        _strip_prefix(mv_sd, "model.vae."), map_ldm_vae(n_vae_lv),
        mv_params["params"], prefix="vae/")
    m3, miss3, un3 = apply_weight_map(
        _strip_prefix(mv_sd, "model.text_encoder."),
        map_clip_text(pipe.mvldm.model.clip_layers),
        mv_params["params"], prefix="text_encoder/")
    mv_prefixes = ("model.unet.", "model.vae.", "model.text_encoder.")
    report["mvldm"] = {
        "mapped": m1 + m2 + m3,
        "missing": miss1 + miss2 + miss3,
        "unassigned": un1 + un2 + un3,
        "skipped": [k for k in mv_sd if not k.startswith(mv_prefixes)],
    }
    pipe.mvldm_params = mv_params

    # --- decoder tower: model.vae.* (gaussian-headed, EMANorm-wrapped) +
    # model.cross_view_dit.* ------------------------------------------------
    gs_vars = jax.tree.map(np.asarray, pipe.gsdecoder_vars)
    gs_sd_raw = _strip_prefix(towers["decoder"], "model.vae.")
    gs_sd, ema_buffers = _normalize_gs_vae_sd(gs_sd_raw)
    n_gs_lv = len(pipe.gsdecoder.vae_ch_mult)
    m4, miss4, un4 = apply_weight_map(
        gs_sd, map_ldm_vae(n_gs_lv), gs_vars["params"], prefix="vae/")
    ema_unassigned = []
    for lvl, val in ema_buffers.items():
        path = f"vae/decoder/up_{lvl}_upsample/ema_norm/magnitude_ema"
        if not ("batch_stats" in gs_vars and assign_into(
                gs_vars["batch_stats"], path, np.asarray(val))):
            ema_unassigned.append(path)
    m5, miss5, un5 = apply_weight_map(
        _strip_prefix(towers["decoder"], "model.cross_view_dit."),
        map_raydiff_dit(pipe.gsdecoder.dit_depth),
        gs_vars["params"], prefix="cross_view_dit/")
    gs_prefixes = ("model.vae.", "model.cross_view_dit.")
    report["decoder"] = {
        "mapped": m4 + m5 + (len(ema_buffers) - len(ema_unassigned)),
        "missing": miss4 + miss5,
        "unassigned": un4 + un5 + ema_unassigned,
        # decoder_2d is the reference's frozen 2D deepcopy used only during
        # training visualisation (gs_decoder.py:118) — expected skip
        "skipped": [k for k in towers["decoder"]
                    if not k.startswith(gs_prefixes)],
    }
    pipe.gsdecoder_vars = gs_vars
    return report


def pad_conv_in_channels(kernel: np.ndarray, target_in: int,
                         rng: np.random.Generator,
                         copy_rgb_to_depth: bool = False,
                         std: float = 0.01) -> np.ndarray:
    """Widen a flax conv kernel (kh, kw, I, O) to ``target_in`` channels.

    Replicates the reference's conv surgery (``mv_ldm.py:104-121``): new
    channels get 0.01-std random init; optionally the first 4 (RGB-latent)
    input channels are copied into channels 4:8 (depth latents).
    """
    kh, kw, i, o = kernel.shape
    assert target_in >= i
    extra = rng.normal(0.0, std, size=(kh, kw, target_in - i, o)).astype(
        kernel.dtype)
    out = np.concatenate([kernel, extra], axis=2)
    if copy_rgb_to_depth and target_in >= 8 and i >= 4:
        out[:, :, 4:8, :] = kernel[:, :, 0:4, :]
    return out


def pad_conv_out_channels(kernel: np.ndarray, bias: np.ndarray,
                          target_out: int, rng: np.random.Generator,
                          copy_rgb_to_depth: bool = False,
                          std: float = 0.01):
    """Widen a flax conv kernel's output channels (+ bias) analogously."""
    kh, kw, i, o = kernel.shape
    extra = rng.normal(0.0, std, size=(kh, kw, i, target_out - o)).astype(
        kernel.dtype)
    k = np.concatenate([kernel, extra], axis=3)
    # reference pads the bias with zeros for ALL new channels (mv_ldm.py:118:
    # F.pad(bias, (0, extra))) — the depth rows get the RGB *weights* copied
    # but keep a zero bias
    b = np.concatenate([bias, np.zeros(target_out - o, bias.dtype)])
    if copy_rgb_to_depth and target_out >= 8 and o >= 4:
        k[:, :, :, 4:8] = kernel[:, :, :, 0:4]
    return k, b
