#!/usr/bin/env python
"""Dataloader smoke / visualization (the reference's vis/test_dataloader.py).

Iterates a configured (or synthetic) dataset, prints batch shapes and
throughput, and dumps a grid of the first batch for visual inspection.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=None, help="annotated-scenes root dir")
    ap.add_argument("--annotation", default=None)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--num_batches", type=int, default=5)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--out", default="/tmp/dataloader_smoke")
    args = ap.parse_args()

    from prometheus_tpu.datasets import DataLoader, DL3DV10KDataset
    from prometheus_tpu.utils.image import make_grid, postprocess_image, save_image

    if args.root is None:
        raise SystemExit("provide --root (see tools/build_metadata.py to "
                         "create annotations)")
    ds = DL3DV10KDataset(args.root, annotation_path=args.annotation,
                         img_size=args.img_size, num_input_views=4,
                         num_novel_views=0)
    dl = DataLoader(ds, batch_size=args.batch_size, num_workers=4)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    for i, batch in enumerate(dl):
        if i >= args.num_batches:
            break
        print(f"batch {i}: images {batch['images_mv'].shape} "
              f"cameras {batch['cameras_mv'].shape} "
              f"texts {batch['text_mv'][:2]}")
        if i == 0:
            imgs = postprocess_image(
                batch["images_mv"].reshape(-1, 3, args.img_size, args.img_size))
            save_image(make_grid(imgs), os.path.join(args.out, "batch0.png"))
    n = min(args.num_batches, len(dl))
    dt = time.time() - t0
    print(f"{n} batches in {dt:.2f}s "
          f"({n * args.batch_size / dt:.1f} scenes/s)")


if __name__ == "__main__":
    main()
