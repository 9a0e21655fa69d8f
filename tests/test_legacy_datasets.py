"""Legacy (Director3D-era) dataset formats: CO3D jgz ingestion, blender
transforms.json renders, and the GMLDM mixing shape
(reference ``datasets/legacy/``)."""
import gzip
import json
import os
import random
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _orbit_pose(theta, r=4.0):
    """OpenGL c2w orbiting the origin in the y=0 plane, looking at it."""
    eye = np.asarray([r * np.sin(theta), 0.0, r * np.cos(theta)])
    fwd = -eye / np.linalg.norm(eye)              # toward origin
    up = np.asarray([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, -fwd, eye
    return c2w


def _write_img(path, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(path)


def test_blender_ingest_and_reader(tmp_path):
    root = os.path.join(tmp_path, "renders")
    for scene in ("car_001", "chair_002"):
        frames = []
        for i in range(6):
            rel = f"r_{i}"
            _write_img(os.path.join(root, scene, f"{rel}.png"), i)
            frames.append({"file_path": rel,
                           "transform_matrix": _orbit_pose(i * 1.0).tolist()})
        with open(os.path.join(root, scene, "transforms.json"), "w") as fp:
            json.dump({"camera_angle_x": 0.9, "frames": frames}, fp)

    ann = os.path.join(tmp_path, "blender.pkl")
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "build_metadata.py"), "blender",
         "--root", root, "--out", ann, "--prompt_suffix", "3D asset"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr

    from prometheus_tpu.datasets import ShapeNetDataset

    ds = ShapeNetDataset(root, annotation_path=ann, img_size=32,
                         num_input_views=2, num_novel_views=2)
    item = ds.get_raw_data(0, random.Random(0))
    assert item["images_mv"].shape == (4, 3, 32, 32)
    assert item["cameras_mv"].shape == (4, 18)
    assert "3D asset" in item["text_mv"]
    assert np.isfinite(item["cameras_mv"]).all()


def _p3d_viewpoint_from_opencv_w2c(R_cv, t_cv):
    """Invert the converter's math: pytorch3d R/T whose OpenCV form is
    (R_cv, t_cv). R_p3d[:, :2] *= -1 then transpose gives R_cv."""
    R = R_cv.T.copy()
    R[:, :2] *= -1.0
    T = t_cv.copy()
    T[:2] *= -1.0
    return R, T


def test_co3d_ingest_and_reader(tmp_path):
    root = os.path.join(tmp_path, "co3d")
    H = W = 48
    frames_meta = []
    for i in range(5):
        c2w = _orbit_pose(0.8 * i, r=3.0)
        # opengl c2w -> opencv w2c
        flip = np.diag([1.0, -1.0, -1.0])
        R_cv_c2w = c2w[:3, :3] @ flip
        w2c_R = R_cv_c2w.T
        w2c_t = -R_cv_c2w.T @ c2w[:3, 3]
        R_p3d, T_p3d = _p3d_viewpoint_from_opencv_w2c(w2c_R, w2c_t)
        rel = f"apple/seq0/images/frame{i:03d}.jpg"
        _write_img(os.path.join(root, rel), i)
        frames_meta.append({
            "sequence_name": "seq0", "frame_number": i,
            "image": {"path": rel, "size": [H, W]},
            "viewpoint": {"R": R_p3d.tolist(), "T": T_p3d.tolist(),
                          "focal_length": [2.0, 2.0],
                          "principal_point": [0.0, 0.0]},
        })
    os.makedirs(os.path.join(root, "apple"), exist_ok=True)
    with gzip.open(os.path.join(root, "apple", "frame_annotations.jgz"),
                   "wt") as fp:
        json.dump(frames_meta, fp)

    ann = os.path.join(tmp_path, "co3d.pkl")
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "build_metadata.py"), "co3d",
         "--root", root, "--out", ann],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr

    import pickle

    meta = pickle.load(open(ann, "rb"))
    assert "apple/seq0" in meta
    # converted pose round-trips to the original OpenCV c2w
    pose0 = np.asarray(meta["apple/seq0"]["poses"][0])
    c2w = _orbit_pose(0.0, r=3.0)
    expect = c2w[:3, :3] @ np.diag([1.0, -1.0, -1.0])
    np.testing.assert_allclose(pose0[:, :3], expect, atol=1e-6)
    np.testing.assert_allclose(pose0[:, 3], c2w[:3, 3], atol=1e-6)
    fx = meta["apple/seq0"]["intrinsics"][0][0]
    assert abs(fx - 2.0 * (min(H, W) / 2.0)) < 1e-6

    from prometheus_tpu.datasets import CO3DDataset

    ds = CO3DDataset(root, annotation_path=ann, img_size=32,
                     num_input_views=2, num_novel_views=2)
    item = ds.get_raw_data(0, random.Random(0))
    assert item["images_mv"].shape == (4, 3, 32, 32)
    assert np.isfinite(item["cameras_mv"]).all()
    assert item["text_mv"] == "apple"


def test_legacy_mixing_shape(tmp_path):
    # objaverse-like scene + t2i captions, merged per item (mixing.py shape)
    from prometheus_tpu.datasets import LegacyMixingDataset

    import pickle

    oroot = os.path.join(tmp_path, "objv")
    scene = "obj0"
    for i in range(4):
        _write_img(os.path.join(oroot, scene, f"{i:03d}.png"), i)
    # ObjaverseDataset expects OpenCV-convention c2w
    gl2cv = np.diag([1.0, -1.0, -1.0])
    poses = [np.concatenate(
        [_orbit_pose(1.5 * i)[:3, :3] @ gl2cv,
         _orbit_pose(1.5 * i)[:3, 3:4]], axis=1).tolist() for i in range(4)]
    ann = {scene: {"frames": [f"{scene}/{i:03d}.png" for i in range(4)],
                   "poses": poses,
                   "intrinsics": [[40.0, 40.0, 24.0, 24.0]] * 4,
                   "captions": ["a toy"]}}
    apath = os.path.join(tmp_path, "objv.pkl")
    pickle.dump(ann, open(apath, "wb"))

    troot = os.path.join(tmp_path, "t2i")
    for i in range(3):
        _write_img(os.path.join(troot, f"im{i}.png"), 10 + i)
    json.dump([{"file": f"im{i}.png", "caption": f"cap {i}"}
               for i in range(3)],
              open(os.path.join(troot, "annotations.json"), "w"))

    ds = LegacyMixingDataset(
        objaverse_kwargs=dict(root_dir=oroot, annotation_path=apath,
                              num_input_views=2, num_novel_views=0,
                              sample_rate=-1),
        t2i_kwargs=dict(root_dir=troot, images_per_iter=2),
        img_size=32)
    item = ds[0]
    assert item["images_mv"].shape[0] == 2
    assert item["images_sv"].shape == (2, 3, 32, 32)
    assert "text_mv" in item and "text_sv" in item
