#!/usr/bin/env python
"""Benchmark evaluation CLI: text-to-3D over prompt sets with GT trajectories.

Parity target: ``/root/reference/eval.py`` — runs the full pipeline over a
benchmark directory (``<bench>/prompts.txt`` + optional per-prompt camera
``.pkl``/``.npy`` trajectories, the scene_benchmark80 layout) and exports
frame galleries for metric computation (``prometheus_tpu.metrics`` computes
BRISQUE/NIQE inline; CLIP score needs the image tower).
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--benchmark_dir", type=str, required=True,
                   help="dir with prompts.txt and optional camera/<i>.pkl")
    p.add_argument("--export_dir", type=str, default="./eval_out")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--num_steps", type=int, default=100)
    p.add_argument("--num_views", type=int, default=8)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--guidance_type", type=str, default="joint")
    p.add_argument("--cfg_rescale", type=float, default=0.7)
    p.add_argument("--render_size", type=int, default=512)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--small", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_prompts", type=int, default=-1)
    p.add_argument("--traj_idx", type=int, default=0,
                   help="candidate index for (C, N, 18) trajectory files")
    p.add_argument("--compute_metrics", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="per-prompt proxy metrics (--no-compute_metrics disables)")
    p.add_argument("--refine", type=str, default=None,
                   choices=["sds", "mv_sds"],
                   help="SDS++ refinement before export (reference "
                        "inference.py:52)")
    p.add_argument("--refine_iters", type=int, default=300)
    p.add_argument("--use_3d_mode_every_m_steps", type=int, default=-1)
    p.add_argument("--no_skip_existing", action="store_true",
                   help="re-generate prompts whose export dir is already "
                        "complete (default: skip them, making interrupted "
                        "sweeps resumable)")
    return p.parse_args()


def load_benchmark(bench_dir: str, traj_idx: int = 0):
    """Returns [(prompt, cameras_or_None)]; cameras (1, N, 18).

    Preferred layout: ``index.json`` + ``camera/<i>.npy`` as produced by
    ``tools/import_benchmarks.py`` (the reference's scene_benchmark80 /
    gpt4v_gallery / t3bench sets). Multi-candidate trajectory files
    ``(C, N, 18)`` follow the reference's per-candidate loop
    (``eval.py:123-124``); ``traj_idx`` picks the candidate.
    Fallback: a bare ``prompts.txt`` (+ optional ``camera/<i>.pkl|npy``).
    """
    index_path = os.path.join(bench_dir, "index.json")
    entries = []
    if os.path.exists(index_path):
        with open(index_path) as fp:
            index = json.load(fp)
        for e in index:
            cams = np.load(os.path.join(bench_dir, e["camera"])).astype(
                np.float32)
            if cams.ndim == 3:  # (C, N, 18) candidates
                cams = cams[min(traj_idx, cams.shape[0] - 1)]
            entries.append((e["text"], cams[None]))
        return entries
    with open(os.path.join(bench_dir, "prompts.txt")) as fp:
        prompts = [line.strip() for line in fp if line.strip()]
    cam_dir = os.path.join(bench_dir, "camera")
    for i, prompt in enumerate(prompts):
        cams = None
        for ext, loader in ((".pkl", lambda p: pickle.load(open(p, "rb"))),
                            (".npy", np.load)):
            path = os.path.join(cam_dir, f"{i:04d}{ext}")
            if os.path.exists(path):
                cams = np.asarray(loader(path), np.float32)
                if cams.ndim == 2:
                    cams = cams[None]
                break
        entries.append((prompt, cams))
    return entries


def main():
    from prometheus_tpu.utils.platform import device_sync, honor_jax_platforms_env
    honor_jax_platforms_env()
    args = parse_args()
    import jax

    from inference import build_pipeline
    from prometheus_tpu.utils.image import make_grid, postprocess_image, save_image

    pipe = build_pipeline(args)
    entries = load_benchmark(args.benchmark_dir, traj_idx=args.traj_idx)
    if args.max_prompts > 0:
        entries = entries[: args.max_prompts]

    refiner = None
    if args.refine:
        refiner = pipe.build_refiner(
            args.refine, total_iterations=args.refine_iters,
            img_size=min(args.render_size, 256))

    all_metrics = []
    for i, (prompt, cams) in enumerate(entries):
        out_dir = os.path.join(args.export_dir, f"{i:04d}")
        view_paths = [os.path.join(out_dir, f"view_{v:02d}.png")
                      for v in range(args.num_views)]
        if (not args.no_skip_existing
                and all(os.path.exists(p) for p in view_paths)):
            # resume an interrupted sweep: reload the exported frames so the
            # metrics summary still covers every prompt
            from prometheus_tpu.utils.image import load_image

            frames = np.stack([load_image(p) for p in view_paths])
            print(f"[{i+1}/{len(entries)}] {prompt[:60]} -> {out_dir} "
                  "(existing, skipped)")
        else:
            key = jax.random.PRNGKey(args.seed + i)
            kwargs = dict(
                num_views=args.num_views,
                num_inference_steps=args.num_steps,
                guidance_scale=args.guidance_scale,
                guidance_type=args.guidance_type,
                cfg_rescale=args.cfg_rescale,
                render_size=args.render_size, image_size=args.image_size,
                refiner=refiner,
                use_3d_mode_every_m_steps=args.use_3d_mode_every_m_steps,
            )
            if cams is not None:
                import jax.numpy as jnp

                dense = jnp.asarray(cams)
                kwargs["cameras"] = pipe.sparse_views(dense, args.num_views)
            result = pipe.generate(prompt, key, **kwargs)
            device_sync(result["images_gs_render"])

            os.makedirs(out_dir, exist_ok=True)
            frames = postprocess_image(
                np.asarray(result["images_gs_render"][0]))
            for v, frame in enumerate(frames):
                save_image(frame, view_paths[v])
            save_image(make_grid(frames), os.path.join(out_dir, "grid.png"))

        entry = {"prompt": prompt, "dir": out_dir}
        if args.compute_metrics:
            from prometheus_tpu.metrics import brisque, niqe

            imgs = frames.astype(np.float32) / 255.0
            # '_proxy' suffix: these are documented NSS proxies, NOT the
            # official BRISQUE/NIQE models (see prometheus_tpu/metrics.py) —
            # not comparable to published numbers without the official assets
            entry["brisque_proxy"] = float(np.mean([brisque(f) for f in imgs]))
            entry["niqe_proxy"] = float(np.mean([niqe(f) for f in imgs]))
        all_metrics.append(entry)
        print(f"[{i+1}/{len(entries)}] {prompt[:60]} -> {out_dir}")

    summary = {
        "num_prompts": len(all_metrics),
        "metrics_are_proxies": bool(args.compute_metrics),
        "per_prompt": all_metrics,
    }
    if args.compute_metrics:
        summary["brisque_proxy_mean"] = float(
            np.mean([m.get("brisque_proxy", np.nan) for m in all_metrics]))
        summary["niqe_proxy_mean"] = float(
            np.mean([m.get("niqe_proxy", np.nan) for m in all_metrics]))
    with open(os.path.join(args.export_dir, "metrics.json"), "w") as fp:
        json.dump(summary, fp, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "per_prompt"}))


if __name__ == "__main__":
    main()
