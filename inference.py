#!/usr/bin/env python
"""Text -> 3DGS scene inference CLI.

Parity target: ``/root/reference/inference.py`` — loads the bundled
checkpoint {traj, decoder, mvldm}, runs TrajDiT -> sparse views -> MV-LDM
sampling -> GSDecoder, and exports multi-view PNG grids, depth colormaps,
``.ply``/``.splat`` files, and a 120-frame orbit video per prompt.

Examples:
    python inference.py --prompt "a cozy cabin" --export_dir out/
    python inference.py --prompt_file prompts.txt --ckpt pretrained/full.ckpt
    python inference.py --prompt "x" --small --num_steps 10   # smoke
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--prompt_file", type=str, default=None)
    p.add_argument("--ref_image", type=str, default=None,
                   help="image-to-3D: reference image (CLIP-image cond)")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--use_3d_mode_every_m_steps", type=int, default=-1,
                   help="render-consistent resampling every m steps (-1 off)")
    p.add_argument("--refine", type=str, default=None,
                   choices=["sds", "mv_sds"],
                   help="test-time SDS++ refinement of the gaussians "
                        "(reference inference.py:52)")
    p.add_argument("--refine_iters", type=int, default=300)
    p.add_argument("--ckpt", type=str, default=None,
                   help="full.ckpt bundle / orbax dir; random init if absent")
    p.add_argument("--export_dir", type=str, default="./exports")
    p.add_argument("--num_steps", type=int, default=100)
    p.add_argument("--num_traj_steps", type=int, default=100)
    p.add_argument("--num_views", type=int, default=8)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--guidance_type", type=str, default="joint",
                   choices=["none", "text", "pose", "joint", "hybrid"])
    p.add_argument("--cfg_rescale", type=float, default=0.7)
    p.add_argument("--sampler", type=str, default="euler",
                   choices=["euler", "dpmpp_2m"],
                   help="euler = reference-exact; dpmpp_2m = DPM-Solver++(2M)"
                        " multistep (same ODE accuracy at ~1/3 the steps)")
    p.add_argument("--shard_views", action="store_true",
                   help="shard the denoise scan's views over all local "
                        "devices (latency-parallel inference; "
                        "MVLDMSystem.sample_view_sharded)")
    p.add_argument("--cfg_interval_frac", type=float, default=None,
                   help="fast mode: apply CFG only on this high-noise "
                        "fraction of steps (Kynkaanniemi et al. 2024); "
                        "default None = reference-exact full-interval CFG")
    p.add_argument("--render_size", type=int, default=512)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--num_samples", type=int, default=1,
                   help="independent samples per prompt (distinct trajectory"
                        " + noise; reference inference.py num_samples)")
    p.add_argument("--num_video_frames", type=int, default=120)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--no_video", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="reduced model (smoke tests / CI)")
    p.add_argument("--seed", type=int, default=0)
    # EMA promotion happens at bundle time (tools/create_final_ckpt.py), so
    # inference has no separate EMA/plain switch (reference --use_ema is also
    # consumed by its finalckpt bundler, not the sampler).
    p.add_argument("--bpe_vocab", type=str, default=None,
                   help="CLIP BPE merges file (exact tokenization)")
    return p.parse_args()


def build_pipeline(args):
    """Construct the pipeline (checkpoint restore or random init)."""
    import jax
    import jax.numpy as jnp

    from bench import build_flagship
    from prometheus_tpu.models.clip_text import CLIPTokenizer

    pipe, _ = build_flagship(small=args.small)
    if getattr(args, "bpe_vocab", None):  # eval.py reuses this builder
        pipe.tokenizer = CLIPTokenizer(args.bpe_vocab)
    if args.ckpt and os.path.exists(args.ckpt):
        from prometheus_tpu.checkpoint import restore_checkpoint

        if os.path.isdir(args.ckpt):  # orbax bundle: {mvldm, traj, gsdecoder}
            tree = restore_checkpoint(args.ckpt, target={
                "mvldm": pipe.mvldm_params,
                "traj": pipe.traj_params,
                "gsdecoder": pipe.gsdecoder_vars,
            })
            pipe.mvldm_params = tree["mvldm"]
            pipe.traj_params = tree["traj"]
            pipe.gsdecoder_vars = tree["gsdecoder"]
        else:
            # raw torch full.ckpt bundle (reference create_finalckpt.py
            # layout) — convert in place through the same tables
            # tools/convert_ckpt.py uses
            from prometheus_tpu.checkpoint import (convert_bundle,
                                                   split_full_ckpt)

            report = convert_bundle(split_full_ckpt(args.ckpt), pipe)
            for tower, r in report.items():
                bad = (r.get("missing", []) + r.get("unassigned", [])
                       + r.get("unmapped", []))
                if bad:
                    print(f"[inference] WARNING: {tower}: "
                          f"{len(bad)} unconverted entries, e.g. {bad[:5]}")
                print(f"[inference] {tower}: {r['mapped']} tensors converted,"
                      f" {len(r.get('skipped', []))} skipped")
    else:
        print("[inference] no checkpoint given/found - using random weights")
    return pipe


def export_result(result, pipe, prompt: str, out_dir: str, args) -> dict:
    import numpy as np

    from prometheus_tpu.utils import export_gaussians
    from prometheus_tpu.utils.image import (
        colorize_depth, make_grid, postprocess_image, save_image, save_video)

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    imgs = postprocess_image(np.asarray(result["images_gs_render"][0]))
    grid = make_grid(imgs)
    paths["renders"] = os.path.join(out_dir, "gs_renders.png")
    save_image(grid, paths["renders"])

    if "images_sds_gs_render" in result:
        imgs_sds = postprocess_image(
            np.asarray(result["images_sds_gs_render"][0]))
        paths["renders_refined"] = os.path.join(out_dir,
                                                "gs_renders_refined.png")
        save_image(make_grid(imgs_sds), paths["renders_refined"])

    imgs2d = postprocess_image(np.asarray(result["images_pred"][0]))
    paths["images_2d"] = os.path.join(out_dir, "mv_images.png")
    save_image(make_grid(imgs2d), paths["images_2d"])

    deps = np.asarray(result["depths_pred"][0, :, 0])
    dep_grid = make_grid(colorize_depth(deps, 0.0, 1.0))
    paths["depths"] = os.path.join(out_dir, "mv_depths.png")
    save_image(dep_grid, paths["depths"])

    gaussians = tuple(np.asarray(g) for g in result["gaussians"])
    export_gaussians(os.path.join(out_dir, "gaussians"), gaussians)
    paths["ply"] = os.path.join(out_dir, "gaussians.ply")
    paths["splat"] = os.path.join(out_dir, "gaussians.splat")

    if not args.no_video:
        frames = pipe.render_orbit_video(
            result["gaussians"], result["dense_cameras"],
            num_frames=args.num_video_frames, size=args.render_size,
            mesh=getattr(args, "_vs_mesh", None))
        frames_u8 = postprocess_image(frames)
        paths["video"] = save_video(
            frames_u8, os.path.join(out_dir, "orbit.mp4"), fps=args.fps)

    with open(os.path.join(out_dir, "meta.json"), "w") as fp:
        json.dump({"prompt": prompt, "paths": paths}, fp, indent=2)
    return paths


def main():
    from prometheus_tpu.utils.platform import device_sync, honor_jax_platforms_env
    honor_jax_platforms_env()
    args = parse_args()
    prompts = []
    if args.prompt:
        prompts.append(args.prompt)
    if args.prompt_file:
        with open(args.prompt_file) as fp:
            prompts.extend(line.strip() for line in fp if line.strip())
    if not prompts and not args.ref_image:
        raise SystemExit("provide --prompt, --prompt_file, or --ref_image")

    import jax

    pipe = build_pipeline(args)

    if args.ref_image:
        import jax.numpy as jnp
        import numpy as np

        from prometheus_tpu.datasets.transforms import (
            center_crop_and_resize, decode_image, normalize_image)
        from prometheus_tpu.models import CLIPImageEncoder
        from prometheus_tpu.models.depth_anything import make_depth_fn
        from prometheus_tpu.utils import get_random_cameras

        key = jax.random.PRNGKey(args.seed)
        if pipe.image_encoder is None:
            enc = CLIPImageEncoder() if not args.small else CLIPImageEncoder(
                image_size=28, width=64, num_heads=4, num_layers=2,
                proj_dim=pipe.mvldm.model.context_dim)
            pipe.image_encoder = enc
            pipe.image_encoder_params = enc.init(
                key, jnp.zeros((1, 3, 64, 64)))
            pipe.depth_fn = make_depth_fn(key)
        raw = decode_image(open(args.ref_image, "rb").read())
        img_size = pipe.mvldm.model.image_size
        img, _ = center_crop_and_resize(raw, img_size)
        ref = jnp.asarray(normalize_image(img))[None, None]
        cams = get_random_cameras(key, args.num_views,
                                  size=args.image_size)[None]
        result = pipe.generate_image_to_3d(
            ref, cams, key, num_inference_steps=args.num_steps,
            guidance_scale=args.guidance_scale,
            cfg_rescale=args.cfg_rescale, render_size=args.render_size)
        result["dense_cameras"] = cams
        out_dir = os.path.join(args.export_dir, "image_to_3d")
        export_result(result, pipe, f"image:{args.ref_image}", out_dir, args)
        print(f"[image-to-3d] {args.ref_image} -> {out_dir}")
        if not prompts:
            return

    refiner = None
    if args.refine:
        refiner = pipe.build_refiner(
            args.refine, total_iterations=args.refine_iters,
            img_size=min(args.render_size, 256))

    vs_mesh = None
    if args.shard_views:
        from prometheus_tpu.parallel import make_mesh
        vs_mesh = make_mesh()
        if args.num_views % vs_mesh.shape["data"] != 0:
            raise SystemExit(f"--shard_views needs num_views divisible by "
                             f"the device count ({vs_mesh.shape['data']})")
    args._vs_mesh = vs_mesh  # export_result shards the orbit video over it

    for i, prompt in enumerate(prompts):
      for j in range(max(1, args.num_samples)):
        # sample 0 keeps the historical per-prompt key; extra samples fold
        # the sample index in (distinct trajectory + denoise noise, matching
        # the reference's num_samples batch of TrajDiT draws)
        key = jax.random.PRNGKey(args.seed + i)
        if j:
            key = jax.random.fold_in(key, j)
        t0 = time.time()
        result = pipe.generate(
            prompt, key,
            view_shard_mesh=vs_mesh,
            num_views=args.num_views,
            num_inference_steps=args.num_steps,
            num_traj_steps=args.num_traj_steps,
            guidance_scale=args.guidance_scale,
            guidance_type=args.guidance_type,
            cfg_rescale=args.cfg_rescale,
            render_size=args.render_size,
            image_size=args.image_size,
            use_3d_mode_every_m_steps=args.use_3d_mode_every_m_steps,
            refiner=refiner,
            cfg_interval_frac=args.cfg_interval_frac,
            sampler=args.sampler,
        )
        device_sync(result["images_gs_render"])
        dt = time.time() - t0
        slug = "".join(c if c.isalnum() else "_" for c in prompt[:48]).strip("_")
        out_dir = os.path.join(args.export_dir, f"{i:03d}_{slug}")
        if args.num_samples > 1:  # reference layout: <prompt>/<sample_idx>/
            out_dir = os.path.join(out_dir, str(j))
        paths = export_result(result, pipe, prompt, out_dir, args)
        print(f"[{i+1}/{len(prompts)}] '{prompt}' sample {j} -> {out_dir} "
              f"({dt:.1f}s)")


if __name__ == "__main__":
    main()
