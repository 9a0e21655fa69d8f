"""Raw-layout ingestion: DL3DV transforms.json scene dirs and the UrbanGen
annotation pkl convert into annotations the generic scene reader consumes
(VERDICT round-1 #9/#10 ingestion fill-in)."""
import json
import os
import pickle
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from build_metadata import dl3dv_raw, urbangen_pkl  # noqa: E402


def _write_img(path, size=32):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (size, size, 3), dtype=np.uint8)).save(path)


def make_dl3dv_scene(root, scene="a" * 64, n=6):
    sdir = os.path.join(root, scene)
    frames = []
    for i in range(n):
        name = f"frame_{i:05d}.jpg"
        _write_img(os.path.join(sdir, "images_4", name), 32)
        frames.append({
            "file_path": f"images/{name}",
            "transform_matrix": np.eye(4).tolist(),
        })
    meta = {
        "h": 128, "w": 128, "fl_x": 100.0, "fl_y": 100.0,
        "cx": 64.0, "cy": 64.0, "k1": 0, "k2": 0, "p1": 0, "p2": 0,
        "applied_transform": np.eye(4)[:3].tolist(),
        "frames": frames,
    }
    with open(os.path.join(sdir, "transforms.json"), "w") as fp:
        json.dump(meta, fp)
    with open(os.path.join(sdir, "captions.txt"), "w") as fp:
        fp.write("a tiny synthetic scene\n")
    return scene


def test_dl3dv_raw_ingest(tmp_path):
    root = str(tmp_path / "dl3dv")
    scene = make_dl3dv_scene(root)
    out = str(tmp_path / "ann.pkl")
    dl3dv_raw(root, out, require_caption=True)
    ann = pickle.load(open(out, "rb"))
    assert scene in ann
    e = ann[scene]
    assert len(e["frames"]) == 6 and np.asarray(e["poses"]).shape == (6, 3, 4)
    # intrinsics rescaled to the images_4 resolution (32 vs h=128 -> /4)
    assert abs(e["intrinsics"][0] - 25.0) < 1e-6
    assert e["captions"] == ["a tiny synthetic scene"]

    # the generic reader consumes it end to end
    from prometheus_tpu.datasets import DL3DV10KDataset

    ds = DL3DV10KDataset(root, annotation_path=out, img_size=32,
                         num_input_views=2, num_novel_views=2, sample_rate=1,
                         use_caption=True)
    item = ds[0]
    assert item["images_mv"].shape == (4, 3, 32, 32)
    assert item["cameras_mv"].shape == (4, 18)


def test_urbangen_pkl_ingest(tmp_path):
    root = str(tmp_path / "urban")
    src = {}
    for sub in ("kitti360", "nuscenes"):
        frames_meta = []
        for i in range(6):
            rel = f"{sub}/seq0/{i:04d}.jpg"
            _write_img(os.path.join(root, rel), 32)
            c2w = np.eye(4)
            c2w[:3, 3] = [0.1 * i, 0, 0.2 * i]
            K = np.asarray([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]])
            frames_meta.append({"image_path": rel, "cam2world": c2w,
                                "cam_K": K})
        src[f"{sub}_seq0"] = frames_meta
    srcp = str(tmp_path / "urban_src.pkl")
    pickle.dump(src, open(srcp, "wb"))
    out = str(tmp_path / "urban_ann.pkl")
    urbangen_pkl(srcp, out)
    ann = pickle.load(open(out, "rb"))
    assert set(ann) == {"kitti360_seq0", "nuscenes_seq0"}
    assert ann["kitti360_seq0"]["subdataset"] == "kitti360"

    from prometheus_tpu.datasets import UrbanGenDataset

    ds = UrbanGenDataset(root, annotation_path=out, img_size=32,
                         num_input_views=2, num_novel_views=2, sample_rate=1,
                         use_caption=False, scene_scale_threshold=0.0,
                         sub_sample_rates={"nuscenes": 2})
    item = ds[0]
    assert item["images_mv"].shape == (4, 3, 32, 32)
