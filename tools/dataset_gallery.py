"""Dataset text/trajectory gallery — browse what the data pipeline feeds.

The reference's ``vis/get_mv_datasets_texttraj.py:1`` dumps per-scene
captions + camera trajectories across its multi-view datasets for manual
inspection. This analog samples K scenes from a configured dataset tree (the
exact config-group composition ``train.py`` uses) or a generic annotated
scene dir, and writes one self-contained HTML gallery per scene with:

- the caption text,
- the sampled view frames as an image strip,
- a top-down frustum plot of the scene's camera trajectory.

    python tools/dataset_gallery.py --root <scene_dir> [--num_scenes 8]
    python tools/dataset_gallery.py --config prometheus_tpu/configs/config.yaml
        [--split train] [--num_scenes 8] [--out /tmp/ds_gallery]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from prometheus_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()  # the axon plugin ignores the env var

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=None, help="annotated-scenes root dir")
    ap.add_argument("--annotation", default=None)
    ap.add_argument("--config", default=None,
                    help="composed config (dataset group) instead of --root")
    ap.add_argument("--split", default="train", choices=["train", "val"])
    ap.add_argument("--num_scenes", type=int, default=8)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--out", default="/tmp/ds_gallery")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from prometheus_tpu.utils.image import make_grid, postprocess_image, save_image
    from prometheus_tpu.utils.visualization import (plot_cameras_png,
                                                    write_html_gallery)

    if args.config:
        from prometheus_tpu.config import load_config
        from prometheus_tpu.datasets.builder import (build_dataset,
                                                     common_kwargs_from_group)

        cfg = load_config(args.config)
        group = cfg.dataset
        node = group[args.split]
        common = common_kwargs_from_group(group)
        common.setdefault("img_size", args.img_size)
        ds = build_dataset(node, common)
    elif args.root:
        from prometheus_tpu.datasets import DL3DV10KDataset

        ds = DL3DV10KDataset(
            args.root, annotation_path=args.annotation,
            img_size=args.img_size, num_input_views=args.views,
            num_novel_views=0)
    else:
        raise SystemExit("provide --root or --config")

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n = min(args.num_scenes, len(ds))
    idxs = rng.choice(len(ds), size=n, replace=False)

    entries = []
    for k, idx in enumerate(idxs):
        item = ds[int(idx)]
        if "images_mv" not in item:       # e.g. pure-T2I leaf of a mixer
            imgs = item.get("images_sv")
            caption = (item.get("text_sv") or ["(no caption)"])[0]
            cams = None
            scene = f"t2i_{idx}"
        else:
            imgs = item["images_mv"]
            caption = item.get("text_mv", "(no caption)")
            if isinstance(caption, (list, tuple)):
                caption = caption[0]
            cams = np.asarray(item["cameras_mv"])
            scene = str(item.get("scene_name_mv", idx))
        files = []
        if imgs is not None:
            frames = postprocess_image(np.asarray(imgs))
            strip = os.path.join(args.out, f"{k:03d}_frames.png")
            save_image(make_grid(frames, cols=len(frames)), strip)
            files.append(os.path.basename(strip))
        if cams is not None:
            traj = os.path.join(args.out, f"{k:03d}_traj.png")
            plot_cameras_png(traj, cams)
            files.append(os.path.basename(traj))
        name = item.get("dataset_name_mv", type(ds).__name__)
        entries.append({"title": f"[{name}] {scene}: {caption}",
                        "images": files})
        print(f"[{k+1}/{n}] {scene}: {caption[:70]}")

    html = write_html_gallery(os.path.join(args.out, "index.html"), entries,
                              title="dataset text/trajectory gallery")
    print(f"gallery: {html}")


if __name__ == "__main__":
    main()
