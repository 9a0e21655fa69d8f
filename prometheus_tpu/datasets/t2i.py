"""Text-to-image single-view dataset (SAM-1B / JourneyDB style).

Parity target: ``/root/reference/prometheus/datasets/t2i_dataset.py`` — flat
image collections with per-image captions, emitting ``images_per_iter``
images per item for the single-view branch of stage-2 training. Caption
cleanup heuristics kept (strip boilerplate prefixes, collapse whitespace).

The reference's ``_TorchSerializedList`` (``t2i_dataset.py:20-130``) exists
to stop fork-based DataLoader workers from copy-on-writing the caption list
per process; this framework's loader is thread-pooled
(``datasets/loader.py``), so the caption list is naturally shared and the
serialized-buffer machinery is unnecessary by construction.
"""
from __future__ import annotations

import json
import os
import re

import numpy as np

from .base import BaseDataset, load_annotation
from .file_readers import make_reader
from .transforms import decode_crop_resize_normalize

_BOILERPLATE = re.compile(
    r"^(the (image|photo) (shows|depicts|features|captures)|"
    r"this (image|photo) (shows|depicts|features)|a photo of)\s*",
    re.IGNORECASE,
)


def clean_caption(text: str) -> str:
    text = _BOILERPLATE.sub("", text.strip())
    text = re.sub(r"\s+", " ", text)
    return text[:1].upper() + text[1:] if text else text


def _load_t2i_annotation(ann_path: str) -> list[dict]:
    """json list/dict (this framework's format) OR the reference's sharded
    ``filenames_and_captions_*.csv`` metadata (``[Image Name, Image Path,
    Caption]`` rows — tools/sa1b/build_metadata.py:92-100, journeydb
    analog) — consumed directly so existing reference-prepared T2I corpora
    work without conversion."""
    import csv
    import glob

    def read_csv(path):
        out = []
        with open(path, newline="", encoding="utf-8") as fp:
            rows = csv.reader(fp)
            header = next(rows, None)
            for r in rows:
                if len(r) >= 3:
                    out.append({"file": r[1], "caption": r[2]})
        return out

    if os.path.isdir(ann_path):
        shards = sorted(
            glob.glob(os.path.join(ann_path, "filenames_and_captions_*.csv"))
            or glob.glob(os.path.join(ann_path, "metadata",
                                      "filenames_and_captions_*.csv")))
        if not shards:
            raise FileNotFoundError(
                f"no annotations.json or CSV shards under {ann_path}")
        items: list[dict] = []
        for s in shards:
            items.extend(read_csv(s))
        return items
    if ann_path.endswith(".csv"):
        return read_csv(ann_path)
    ann = load_annotation(ann_path)
    if isinstance(ann, dict):
        ann = [{"file": k, "caption": v} for k, v in sorted(ann.items())]
    return ann


class Text2ImageDataset(BaseDataset):
    """Annotation: json list of {"file": ..., "caption": ...}, a dict, or
    the reference's sharded CSV metadata (see ``_load_t2i_annotation``)."""

    def __init__(self, root_dir: str, annotation_path: str | None = None,
                 images_per_iter: int = 4, drop_text_p: float = 0.0, **kw):
        kw.setdefault("dataset_name", "T2I")
        super().__init__(**kw)
        self.root_dir = root_dir
        self.reader = make_reader(root_dir)
        self.images_per_iter = images_per_iter
        self.drop_text_p = drop_text_p
        ann_path = annotation_path or os.path.join(root_dir, "annotations.json")
        if not os.path.exists(ann_path) and annotation_path is None:
            ann_path = root_dir  # fall back to CSV-shard discovery
        self.items = _load_t2i_annotation(ann_path)

    def inner_len(self) -> int:
        return len(self.items)

    def get_raw_data(self, idx: int, rng):
        images, texts = [], []
        for k in range(self.images_per_iter):
            item = self.items[(idx + k) % len(self.items)]
            img, _ = decode_crop_resize_normalize(
                self.reader.fetch(item["file"]), self.img_size)
            images.append(img)
            cap = clean_caption(item.get("caption", ""))
            if rng.random() < self.drop_text_p:
                cap = ""
            texts.append(cap)
        return {
            "images_sv": np.stack(images),   # (M, 3, H, W)
            "text_sv": texts,
        }
