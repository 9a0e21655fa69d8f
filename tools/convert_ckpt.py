#!/usr/bin/env python
"""Convert the published torch ``full.ckpt`` bundle into framework params.

Parity target: the inverse of ``/root/reference/tools/create_finalckpt.py``
plus the per-tower key conversions the reference does at load time
(``convert_diffuser_to_origin.py``, ``mv_ldm.py:86-131``). Produces an Orbax
checkpoint directory consumable by ``inference.py --ckpt``.

Usage:
    python tools/convert_ckpt.py --full_ckpt pretrained/full.ckpt \
        --out pretrained/orbax_full [--bpe_vocab merges.txt]

Conversion report: every source tensor is either mapped or listed as
unmapped (loud, not silent) so parity gaps are visible per tower.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------------------
# Key mapping: reference LDM/raydiff torch names -> our flax tree paths
# ---------------------------------------------------------------------------

def map_trajdit_key(k: str) -> str | None:
    """TrajDiT state-dict names -> our TrajDiTModel param paths."""
    m = re.match(r"blocks\.(\d+)\.(.*)", k)
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
    from prometheus_tpu.checkpoint import assign_into, t_conv, t_linear

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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax

    from bench import build_flagship
    from prometheus_tpu.checkpoint import save_checkpoint, split_full_ckpt

    towers = split_full_ckpt(args.full_ckpt)
    pipe, _ = build_flagship(small=args.small)

    from prometheus_tpu.weight_maps import (apply_weight_map, map_clip_text,
                                            map_ldm_unet, map_ldm_vae,
                                            map_raydiff_dit)

    report = {}
    traj_params = jax.tree.map(np.asarray, pipe.traj_params)
    mapped, unmapped = convert_tower(
        towers["traj"], map_trajdit_key, traj_params["params"])
    report["traj"] = {"mapped": mapped, "unmapped": unmapped}

    def strip(sd: dict, prefix: str) -> dict:
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    # --- mvldm tower: model.unet.* / model.vae.* / model.text_encoder.* ----
    mv_params = jax.tree.map(np.asarray, pipe.mvldm_params)
    mv_sd = towers["mvldm"]
    n_lv = len(pipe.mvldm.model.channel_mult)
    m1, miss1, un1 = apply_weight_map(
        strip(mv_sd, "model.unet."),
        map_ldm_unet(n_lv, pipe.mvldm.model.num_res_blocks),
        mv_params["params"], prefix="unet/")
    m2, miss2, un2 = apply_weight_map(
        strip(mv_sd, "model.vae."), map_ldm_vae(),
        mv_params["params"], prefix="vae/")
    m3, miss3, un3 = apply_weight_map(
        strip(mv_sd, "model.text_encoder."),
        map_clip_text(pipe.mvldm.model.clip_layers),
        mv_params["params"], prefix="text_encoder/")
    report["mvldm"] = {"mapped": m1 + m2 + m3,
                       "missing": miss1 + miss2 + miss3,
                       "unassigned": un1 + un2 + un3}

    # --- decoder tower: model.vae.* (gaussian-headed) + cross_view_dit.* ---
    gs_vars = jax.tree.map(np.asarray, pipe.gsdecoder_vars)
    gs_sd = towers["decoder"]
    m4, miss4, un4 = apply_weight_map(
        strip(gs_sd, "model.vae."), map_ldm_vae(),
        gs_vars["params"], prefix="vae/")
    m5, miss5, un5 = apply_weight_map(
        strip(gs_sd, "model.cross_view_dit."),
        map_raydiff_dit(pipe.gsdecoder.dit_depth),
        gs_vars["params"], prefix="cross_view_dit/")
    report["decoder"] = {"mapped": m4 + m5, "missing": miss4 + miss5,
                         "unassigned": un4 + un5}
    pipe.mvldm_params = mv_params
    pipe.gsdecoder_vars = gs_vars

    state = {
        "mvldm": jax.tree.map(np.asarray, pipe.mvldm_params),
        "traj": traj_params,
        "gsdecoder": jax.tree.map(np.asarray, pipe.gsdecoder_vars),
    }
    save_checkpoint(args.out, state, step=0)
    with open(os.path.join(args.out, "conversion_report.json"), "w") as fp:
        json.dump(report, fp, indent=2)
    print(json.dumps({k: {kk: (len(vv) if isinstance(vv, list) else vv)
                          for kk, vv in v.items()} for k, v in report.items()},
                     indent=2))


if __name__ == "__main__":
    main()
