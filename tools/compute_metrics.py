#!/usr/bin/env python
"""Aggregate no-reference + text-alignment metrics over generated galleries.

Parity target: ``/root/reference/paper/metric_scripts/compute_all.py:234-321``
— walks per-prompt output directories of a method, scores every frame with
BRISQUE + NIQE (+ CLIP text-image similarity when encoders are available),
and writes ``all_metric.json`` with per-prompt and averaged results.

Method directory adapters (reference input layouts):
    prometheus / this repo : <dir>/<prompt>/view_*.png  (eval.py layout) or
                             <dir>/<prompt>/0/<prompt>/*.png
    director3d             : <dir>/<prompt>/0/<prompt>/*.png
    lgm                    : <dir>/<prompt>/<prompt>/*.png
    gaussiandreamer        : <dir>/<prompt>/save/it1200-test/*.png

Official metric assets are consumed when given (--brisque_svr/--brisque_range
-> libsvm 'allmodel'/'allrange'; --niqe_mat -> niqe_image_params.mat);
otherwise the documented NSS proxies run and scores are marked as proxies.

CLIP score needs converted CLIP weights (--ckpt with image+text towers);
without them it is skipped (a random tower's similarity is meaningless).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def find_frames(prompt_dir: str, method: str) -> list[str]:
    sub = {
        "prometheus": [".", "0"],
        "director3d": ["0"],
        "lgm": ["."],
        "gaussiandreamer": [os.path.join("save", "it1200-test")],
    }[method]
    candidates = [prompt_dir]
    name = os.path.basename(prompt_dir.rstrip("/"))
    for s in sub:
        candidates += [os.path.join(prompt_dir, s),
                       os.path.join(prompt_dir, s, name)]
    for c in candidates:
        if not os.path.isdir(c):
            continue
        frames = sorted(
            os.path.join(c, f) for f in os.listdir(c)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
            and not f.startswith(("grid", "cam_", "mv_")))
        if frames:
            return frames
    return []


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--method", default="prometheus",
                    choices=["prometheus", "director3d", "lgm",
                             "gaussiandreamer"])
    ap.add_argument("--brisque_svr", default=None)
    ap.add_argument("--brisque_range", default=None)
    ap.add_argument("--niqe_mat", default=None)
    ap.add_argument("--clip_ckpt", default=None,
                    help="orbax ckpt with converted CLIP text+image towers")
    ap.add_argument("--max_prompts", type=int, default=-1)
    args = ap.parse_args()

    from PIL import Image

    from prometheus_tpu.metrics import brisque, niqe

    official = args.brisque_svr is not None or args.niqe_mat is not None
    clip_encode = None
    if args.clip_ckpt:
        import jax
        import jax.numpy as jnp

        from prometheus_tpu.checkpoint import restore_checkpoint
        from prometheus_tpu.models import CLIPImageEncoder
        from prometheus_tpu.models.clip_text import CLIPTextModel, CLIPTokenizer

        raw = restore_checkpoint(args.clip_ckpt)
        enc = CLIPImageEncoder()
        txt = CLIPTextModel()
        tok = CLIPTokenizer(raw.get("bpe_vocab") if isinstance(raw, dict)
                            else None)

        def clip_encode(pil_img, prompt):
            img = np.asarray(pil_img.resize((224, 224))) / 127.5 - 1.0
            x = jnp.asarray(img.transpose(2, 0, 1))[None]
            fi = enc.apply(raw["clip_image"], x)
            ft = txt.apply(raw["clip_text"], jnp.asarray(tok([prompt])))
            ft = ft.mean(axis=1)  # pooled text feature
            a = fi / jnp.linalg.norm(fi, axis=-1, keepdims=True)
            b = ft / jnp.linalg.norm(ft, axis=-1, keepdims=True)
            return float((a * b).sum(-1).mean())

    prompt_dirs = sorted(
        os.path.join(args.input_dir, d) for d in os.listdir(args.input_dir)
        if os.path.isdir(os.path.join(args.input_dir, d)))
    if args.max_prompts > 0:
        prompt_dirs = prompt_dirs[: args.max_prompts]

    per_prompt, nq_all, bq_all, cs_all = [], [], [], []
    for pdir in prompt_dirs:
        frames = find_frames(pdir, args.method)
        if not frames:
            continue
        prompt = os.path.basename(pdir).replace("_", " ")
        nq, bq, cs = [], [], []
        for fpath in frames:
            try:
                pil = Image.open(fpath).convert("RGB")
            except Exception:
                continue
            arr = np.asarray(pil, np.float32) / 255.0
            nq.append(niqe(arr, model_params=args.niqe_mat))
            bq.append(brisque(arr, svr_params=args.brisque_svr,
                              feature_range=args.brisque_range))
            if clip_encode is not None:
                cs.append(clip_encode(pil, prompt))
        entry = {"prompt": prompt, "n_frames": len(nq),
                 "niqe": float(np.mean(nq)), "brisque": float(np.mean(bq))}
        if cs:
            entry["clip_score"] = float(np.mean(cs))
            cs_all.append(entry["clip_score"])
        nq_all.append(entry["niqe"])
        bq_all.append(entry["brisque"])
        per_prompt.append(entry)
        print(f"[{len(per_prompt)}/{len(prompt_dirs)}] {prompt[:50]}: "
              f"niqe={entry['niqe']:.3f} brisque={entry['brisque']:.3f}")

    out = {
        "method": args.method,
        "metrics_are_proxies": not official,
        "average_niqe": float(np.mean(nq_all)) if nq_all else None,
        "average_BRISQUE": float(np.mean(bq_all)) if bq_all else None,
        "average_CLIP_score": float(np.mean(cs_all)) if cs_all else None,
        "per_prompt": per_prompt,
    }
    path = os.path.join(args.input_dir, "all_metric.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_prompt"}))


if __name__ == "__main__":
    main()
