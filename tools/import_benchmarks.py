#!/usr/bin/env python
"""Import the reference benchmark assets (prompts + GT camera trajectories)
into this repo's format.

Parity target: ``/root/reference/benchmarks/benchmarks/`` as consumed by
``/root/reference/eval.py:106-124``. The camera pickles are benchmark DATA
(per-prompt ground-truth trajectories); they are converted to ``.npy``
``(N, 18)`` / ``(C, N, 18)`` camera-vector arrays plus a JSON index so
``eval.py`` here can run the same protocol without torch/pickle at eval time.

Layout produced under --out (default ./benchmarks):
    scene_benchmark80/prompt.txt          80 prompts (order = index.json)
    scene_benchmark80/camera/<i>.npy      (15, 18) float32 GT trajectory
    scene_benchmark80/index.json          [{text, camera, scene_name}, ...]
    gpt4v_gallery/prompt.txt              267 prompts
    gpt4v_gallery/camera/<i>.npy          (8, 29, 18) candidate trajectories
    gpt4v_gallery/index.json
    t3bench/prompt_{single,multi,surr}.txt
    t3bench/camera_{...}/<i>.npy          (4, 29, 18) where provided
    t3bench/index_{...}.json

Usage: python tools/import_benchmarks.py [--ref DIR] [--out DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

REF_DEFAULT = "/root/reference/benchmarks/benchmarks"


def _load_pkl(path: str):
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except pickle.UnpicklingError:  # torch-saved pickle (tensor payloads)
        import torch

        d = torch.load(path, map_location="cpu", weights_only=False)
        return {k: (v.numpy() if hasattr(v, "numpy") else v)
                for k, v in d.items()}


def import_prompt_camera_dir(src_dir: str, out_dir: str,
                             prompt_file: str | None = None) -> int:
    """Convert a {prompt.txt, camera/*.pkl} benchmark dir."""
    os.makedirs(os.path.join(out_dir, "camera"), exist_ok=True)
    cam_dir = os.path.join(src_dir, "camera")
    entries = []
    names = sorted(n for n in os.listdir(cam_dir)
                   if n.endswith(".pkl")) if os.path.isdir(cam_dir) else []
    for i, name in enumerate(names):
        d = _load_pkl(os.path.join(cam_dir, name))
        cams = np.asarray(d["cameras"], np.float32)
        rel = f"camera/{i:03d}.npy"
        np.save(os.path.join(out_dir, rel), cams)
        entries.append({
            "text": str(d["text"]),
            "camera": rel,
            "scene_name": str(d.get("scene_name", "")),
            "img_size": int(np.asarray(d.get("img_size", cams[..., 16]
                                             .flat[0])).item()),
        })
    with open(os.path.join(out_dir, "index.json"), "w") as fp:
        json.dump(entries, fp, indent=1)
    # the prompt list (ordering follows the reference's prompt.txt if present)
    src_prompts = prompt_file or os.path.join(src_dir, "prompt.txt")
    if os.path.exists(src_prompts):
        with open(src_prompts) as f:
            lines = [l.strip() for l in f if l.strip()]
        with open(os.path.join(out_dir, "prompt.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    elif entries:
        with open(os.path.join(out_dir, "prompt.txt"), "w") as f:
            f.write("\n".join(e["text"] for e in entries) + "\n")
    return len(entries)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref", default=REF_DEFAULT)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "benchmarks"))
    args = ap.parse_args()

    report = {}
    report["scene_benchmark80"] = import_prompt_camera_dir(
        os.path.join(args.ref, "scene_benchmark80"),
        os.path.join(args.out, "scene_benchmark80"))
    report["gpt4v_gallery"] = import_prompt_camera_dir(
        os.path.join(args.ref, "gpt4v_gallery"),
        os.path.join(args.out, "gpt4v_gallery"))
    for sub in ("single", "multi", "surr"):
        src = os.path.join(args.ref, "t3bench", f"prompt_{sub}")
        if not os.path.isdir(src):
            continue
        out = os.path.join(args.out, "t3bench", f"prompt_{sub}")
        report[f"t3bench/{sub}"] = import_prompt_camera_dir(
            src, out, prompt_file=os.path.join(src, f"prompt_{sub}.txt"))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
