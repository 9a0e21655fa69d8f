#!/usr/bin/env python
"""Bundle trained stage checkpoints into one release checkpoint.

Parity target: ``/root/reference/tools/create_finalckpt.py`` — gathers
{traj, decoder (gsdecoder), mvldm} into a single bundle, promoting EMA
weights to the plain weights and stripping optimizer state.

Usage:
    python tools/create_final_ckpt.py \
        --mvldm workdir/mvldm_ckpts --gsdecoder workdir/gsdecoder_ckpts \
        --traj workdir/trajdit_ckpts --out pretrained/full_orbax
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_stage(ckpt_dir: str, use_ema: bool = True):
    """Load the latest TrainState of a stage; return inference variables."""
    from prometheus_tpu.checkpoint import latest_checkpoint, restore_checkpoint

    path = latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    state = restore_checkpoint(path)
    params = state["params"]
    if use_ema and state.get("ema_params") is not None:
        # EMA may cover only the trainable subtree (frozen towers carry no
        # EMA copy); overlay it onto the live params
        from prometheus_tpu.parallel import full_ema_params
        params = full_ema_params(params, state["ema_params"])
    out = {"params": params}
    model_state = state.get("model_state") or {}
    out.update(model_state)  # e.g. batch_stats (EMANorm magnitudes)
    return out, path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mvldm", required=True)
    ap.add_argument("--gsdecoder", required=True)
    ap.add_argument("--traj", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no_ema", action="store_true")
    args = ap.parse_args()

    from prometheus_tpu.checkpoint import save_checkpoint

    bundle = {}
    for name, d in (("mvldm", args.mvldm), ("gsdecoder", args.gsdecoder),
                    ("traj", args.traj)):
        variables, src = load_stage(d, use_ema=not args.no_ema)
        bundle[name] = variables
        print(f"[bundle] {name}: {src}")
    save_checkpoint(args.out, bundle, step=0, keep=1)
    print(f"[bundle] wrote {args.out}")


if __name__ == "__main__":
    main()
