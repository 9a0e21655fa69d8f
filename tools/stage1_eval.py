#!/usr/bin/env python
"""Stage-1 (GS-VAE) novel-view-synthesis reconstruction evaluation.

Parity target: ``/root/reference/paper/stage1_eval.py`` — run the GSDecoder
on RE10K-format benchmark scenes (mvsplat-style evaluation-index jsons
selecting context/target frames), render the target views, and dump
pred/gt/error/depth frames plus inline PSNR/SSIM.

Usage:
    python tools/stage1_eval.py --data_root data/re10k/test \
        --eval_index assets/evaluation_index_re10k.json \
        --ckpt workdir/gsdecoder_ckpts --out eval_stage1/ [--small]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--eval_index", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="./eval_stage1")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--max_scenes", type=int, default=-1)
    ap.add_argument("--render_size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prometheus_tpu.datasets import RealEstate10KDatasetEval
    from prometheus_tpu.metrics import psnr, ssim
    from prometheus_tpu.models import GSDecoderModel
    from prometheus_tpu.models.depth_anything import make_depth_fn
    from prometheus_tpu.systems import GSDecoderSystem
    from prometheus_tpu.utils.image import colorize_depth, postprocess_image, save_image

    key = jax.random.PRNGKey(0)
    if args.small:
        model = GSDecoderModel(dit_hidden_size=64, dit_depth=2,
                               dit_num_heads=4, vae_ch=32, vae_ch_mult=(1, 2, 4))
    else:
        model = GSDecoderModel()
    system = GSDecoderSystem(model=model, render_size=args.render_size)

    hw = args.render_size // (2 ** (len(model.vae_ch_mult) - 1))
    variables = model.init(
        key, jnp.zeros((1, 1, 3, args.render_size, args.render_size)),
        jnp.zeros((1, 1, 14, hw, hw)), method=GSDecoderModel.init_everything)
    if args.ckpt:
        from prometheus_tpu.checkpoint import latest_checkpoint, restore_checkpoint

        path = latest_checkpoint(args.ckpt) or args.ckpt
        state = restore_checkpoint(path)
        params = state.get("ema_params") or state["params"]
        variables = {"params": params, **(state.get("model_state") or {})}
        print(f"[stage1_eval] loaded {path}")

    depth_fn = make_depth_fn(key)
    ds = RealEstate10KDatasetEval(
        args.data_root, args.eval_index, img_size=args.render_size,
        scene_scale_threshold=0.0)
    os.makedirs(args.out, exist_ok=True)

    results = []
    n = len(ds) if args.max_scenes <= 0 else min(args.max_scenes, len(ds))
    for i in range(n):
        item = ds[i]
        nc = item["num_context"]
        images = jnp.asarray(item["images_mv"])[None]
        cams = jnp.asarray(item["cameras_mv"])[None]
        disp = depth_fn(images[:, :nc])
        out = system.inference(variables, images[:, :nc], disp,
                               cams[:, :nc], cams[:, nc:],
                               render_size=args.render_size)
        pred = np.asarray(out["images_nv_pred"][0])
        gt = np.asarray(images[0, nc:])
        scene_dir = os.path.join(args.out, item["scene_name_mv"])
        os.makedirs(scene_dir, exist_ok=True)
        scene_psnr, scene_ssim = [], []
        for v in range(pred.shape[0]):
            p01 = (pred[v].transpose(1, 2, 0) + 1) / 2
            g01 = (gt[v].transpose(1, 2, 0) + 1) / 2
            scene_psnr.append(psnr(p01, g01))
            scene_ssim.append(ssim(p01, g01))
            save_image(postprocess_image(pred[v]),
                       os.path.join(scene_dir, f"pred_{v:02d}.png"))
            save_image(postprocess_image(gt[v]),
                       os.path.join(scene_dir, f"gt_{v:02d}.png"))
            err = np.abs(p01 - g01).mean(-1)
            save_image(colorize_depth(err, 0, 0.5),
                       os.path.join(scene_dir, f"error_{v:02d}.png"))
            dep = np.asarray(out["depths_nv_pred"][0, v, 0])
            save_image(colorize_depth(dep),
                       os.path.join(scene_dir, f"depth_{v:02d}.png"))
        results.append({"scene": item["scene_name_mv"],
                        "psnr": float(np.mean(scene_psnr)),
                        "ssim": float(np.mean(scene_ssim))})
        print(f"[{i+1}/{n}] {item['scene_name_mv']}: "
              f"psnr {results[-1]['psnr']:.2f} ssim {results[-1]['ssim']:.3f}")

    summary = {"psnr_mean": float(np.mean([r["psnr"] for r in results])),
               "ssim_mean": float(np.mean([r["ssim"] for r in results])),
               "num_scenes": len(results), "per_scene": results}
    with open(os.path.join(args.out, "metrics.json"), "w") as fp:
        json.dump(summary, fp, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "per_scene"}))


if __name__ == "__main__":
    main()
