"""Metric/snapshot logging: JSONL + image dumps, optional wandb passthrough.

Replaces the reference's Lightning/wandb logging stack
(``train.py:65-85``, rank-zero ``log_dict`` + image/video snapshots). The
primary sink is filesystem JSONL + PNG (always works offline); a wandb run is
attached transparently when the package is importable and configured.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False,
                 wandb_kwargs: dict | None = None, rank_zero: bool = True):
        self.log_dir = log_dir
        self.rank_zero = rank_zero
        self.t0 = time.time()
        self._wandb = None
        if rank_zero:
            os.makedirs(log_dir, exist_ok=True)
            os.makedirs(os.path.join(log_dir, "snapshots"), exist_ok=True)
            self.metrics_path = os.path.join(log_dir, "metrics.jsonl")
            if use_wandb:
                try:
                    import wandb

                    self._wandb = wandb.init(dir=log_dir,
                                             **(wandb_kwargs or {}))
                except Exception as e:  # offline/no package: JSONL only
                    print(f"[logger] wandb unavailable ({e}); JSONL only")

    def log_metrics(self, metrics: dict[str, Any], step: int):
        if not self.rank_zero:
            return
        line = {"step": step, "wall": round(time.time() - self.t0, 2)}
        for k, v in metrics.items():
            try:
                line[k] = float(v)
            except (TypeError, ValueError):
                line[k] = str(v)
        with open(self.metrics_path, "a") as fp:
            fp.write(json.dumps(line) + "\n")
        if self._wandb is not None:
            self._wandb.log(line, step=step)

    def log_image(self, name: str, image: np.ndarray, step: int):
        """image: uint8 (H, W, 3)."""
        if not self.rank_zero:
            return
        from PIL import Image

        safe = name.replace("/", "_")
        path = os.path.join(self.log_dir, "snapshots",
                            f"{step:09d}_{safe}.png")
        Image.fromarray(image).save(path)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Image(image)}, step=step)

    def log_gif(self, name: str, frames, step: int,
                duration_ms: int = 100):
        """frames: sequence of uint8 (H, W, 3) — e.g. the per-view sweep of
        a training snapshot (reference ``GifVisualizer`` analog)."""
        if not self.rank_zero:
            return
        from prometheus_tpu.utils.image import save_gif

        safe = name.replace("/", "_")
        path = os.path.join(self.log_dir, "snapshots",
                            f"{step:09d}_{safe}.gif")
        save_gif(frames, path, duration_ms=duration_ms)
        if self._wandb is not None:
            import wandb

            self._wandb.log(
                {name: wandb.Video(path, format="gif")}, step=step)

    def log_grid(self, name: str, rows, step: int, spacing: int = 2):
        """rows: list of lists of uint8 (H, W, 3) — e.g. [gt_views,
        pred_views, depth_views] (reference ``GridVisualizer`` analog)."""
        if not self.rank_zero:
            return
        from prometheus_tpu.utils.image import ImageGrid

        grid = ImageGrid(len(rows), max(len(r) for r in rows),
                         spacing=spacing)
        for i, row in enumerate(rows):
            for j, img in enumerate(row):
                grid.add(i, j, img)
        self.log_image(name, grid.compose(), step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
