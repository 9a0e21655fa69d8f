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
