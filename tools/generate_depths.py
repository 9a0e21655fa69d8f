#!/usr/bin/env python
"""Generate teacher inverse-depth annotations with the flax DepthAnything-V2.

Parity target: ``/root/reference/tools/dl3dv10k/get_depth.py`` (and the
MVImgNet variant it was written for) — walk a dataset annotation, run the
DA-v2 teacher on every frame, and save per-frame inverse depth for stage-1
training. TPU-native: batched flax DA-v2 forwards (weight-converted tower,
parity-tested in tests/test_reference_parity.py) instead of per-image
transformers calls.

Usage:
    python tools/generate_depths.py --root data/dl3dv \
        --annotation data/dl3dv/annotation.pkl --out data/dl3dv_depth \
        --weights pretrained/depth_anything_v2_small.ckpt [--size 518]

Without --weights a luminance proxy runs (loud warning; smoke tests only).
Writes ``<out>/<frame>.npy`` (fp16 inverse depth in [0, 1]) mirroring the
frame paths and ``<annotation>.depth.pkl`` with per-scene ``depths`` lists.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="frame root dir")
    ap.add_argument("--annotation", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default=None,
                    help="torch DepthAnything-V2 checkpoint (transformers "
                         "format); luminance proxy if absent")
    ap.add_argument("--size", type=int, default=518,
                    help="inference resolution (DA-v2 patch-multiple)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max_scenes", type=int, default=-1)
    args = ap.parse_args()

    from prometheus_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    import jax
    import jax.numpy as jnp

    from prometheus_tpu.datasets.transforms import (center_crop_and_resize,
                                                    decode_image,
                                                    normalize_image)

    if args.weights:
        from prometheus_tpu.models.depth_anything import make_depth_fn

        depth_fn = make_depth_fn(jax.random.PRNGKey(0),
                                 weights_path=args.weights)
    else:
        print("[depths] WARNING: no --weights -> luminance proxy teacher "
              "(smoke only; converted DA-v2 weights for real annotations)")

        def depth_fn(images):
            lum = images.mean(axis=2, keepdims=True) * 0.5 + 0.5
            return jnp.clip(lum, 0.0, 1.0)

    with open(args.annotation, "rb") as fp:
        ann = pickle.load(fp)

    run = jax.jit(lambda x: depth_fn(x[None])[0])
    n_frames = 0
    for si, (scene, meta) in enumerate(sorted(ann.items())):
        if args.max_scenes > 0 and si >= args.max_scenes:
            break
        depths = []
        frames = meta["frames"]
        for i in range(0, len(frames), args.batch):
            chunk = frames[i:i + args.batch]
            imgs = []
            for f in chunk:
                raw = decode_image(open(os.path.join(args.root, f),
                                        "rb").read())
                img, _ = center_crop_and_resize(raw, args.size)
                imgs.append(normalize_image(img))
            disp = np.asarray(run(jnp.asarray(np.stack(imgs))))  # (b,1,H,W)
            # normalize per-frame to [0, 1] inverse depth (reference
            # get_depth.py stores normalized relative inverse depth)
            lo = disp.min(axis=(1, 2, 3), keepdims=True)
            hi = disp.max(axis=(1, 2, 3), keepdims=True)
            disp = (disp - lo) / np.maximum(hi - lo, 1e-6)
            for f, d in zip(chunk, disp):
                rel = os.path.splitext(f)[0] + ".npy"
                path = os.path.join(args.out, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                np.save(path, d[0].astype(np.float16))
                depths.append(rel)
                n_frames += 1
        meta["depths"] = depths
    out_ann = args.annotation + ".depth.pkl"
    with open(out_ann, "wb") as fp:
        pickle.dump(ann, fp)
    print(f"[depths] {n_frames} frames -> {args.out}; annotation {out_ann}")


if __name__ == "__main__":
    main()
