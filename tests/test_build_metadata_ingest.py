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


def _write_ascii_ply(path, points):
    with open(path, "w") as fp:
        fp.write("ply\nformat ascii 1.0\n"
                 f"element vertex {len(points)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "end_header\n")
        for p in points:
            fp.write(f"{p[0]} {p[1]} {p[2]}\n")


def test_co3d_proxy_depth(tmp_path):
    """CO3D proxy-depth generation analog (reference tools/co3d/get_proxy.py
    + get_coarse_depth.py): OBB ray-depth and hole-filled point-splat depth
    from a synthetic sequence point cloud, through the real CLI function."""
    from build_metadata import (co3d_proxy_depth, pca_obb, ray_box_depth,
                                read_ply_points, remove_outliers)

    rng = np.random.default_rng(0)
    # unit-ish box of points at z in [4, 5] in front of an identity camera,
    # plus gross outliers the z-score filter must drop
    pts = rng.uniform([-1, -1, 4], [1, 1, 5], size=(2000, 3))
    outliers = rng.uniform(50, 60, size=(5, 3))
    all_pts = np.concatenate([pts, outliers]).astype(np.float32)

    root = tmp_path / "co3d"
    seq = root / "apple" / "seq1"
    seq.mkdir(parents=True)
    _write_ascii_ply(seq / "pointcloud.ply", all_pts)

    # reader + outlier filter
    loaded = read_ply_points(str(seq / "pointcloud.ply"))
    assert loaded.shape == all_pts.shape
    clean = remove_outliers(loaded)
    assert len(clean) < len(loaded) and clean[:, 2].max() < 10

    # identity OpenCV camera at origin looking down +z
    H = W = 64
    fx = fy = 60.0
    cx = cy = 32.0
    ann = {"apple/seq1": {
        "frames": ["f0.jpg"],
        "poses": [np.eye(4)[:3].tolist()],
        "intrinsics": [[fx, fy, cx, cy]],
        "captions": ["apple"]}}
    ann_path = tmp_path / "ann.pkl"
    with open(ann_path, "wb") as fp:
        pickle.dump(ann, fp)

    for mode in ("obb", "points"):
        out_dir = tmp_path / f"depths_{mode}"
        co3d_proxy_depth(str(root), str(ann_path), str(out_dir), mode=mode,
                         depth_size=64)
        new_ann = pickle.load(open(str(ann_path) + ".depth.pkl", "rb"))
        rel = new_ann["apple/seq1"]["depths"][0]
        d = np.load(out_dir / rel).astype(np.float32)
        assert d.shape == (64, 64)
        # center pixel looks straight at the cloud: depth ~= near face (z=4)
        c = d[32, 32]
        assert 3.0 < c < 5.2, (mode, c)
        assert np.isfinite(d).all()

    # direct OBB geometry check: ray through the center hits the box front
    center, axes, half = pca_obb(clean)
    d = ray_box_depth(np.eye(4), fx, fy, cx, cy, H, W, center, axes, half)
    assert abs(d[32, 32] - 4.0) < 0.3


def test_dl3dv_download_and_unzip(tmp_path):
    """download_dl3dv against a file:// mirror fixture: list building mirrors
    the reference's batch/hash layout (download.py:116-171), zips are
    fetched, extracted, and removed; unzip handles a dir of scene zips."""
    import zipfile

    from download_dl3dv import build_download_list, download, unzip_dir

    # meta csv + a fake scene zip served via file://
    meta = tmp_path / "DL3DV-valid.csv"
    meta.write_text("hash,batch\nabc123,1K\ndef456,2K\n")
    mirror = tmp_path / "mirror" / "DL3DV" / "DL3DV-ALL-960P" / "1K"
    mirror.mkdir(parents=True)
    scene_zip = mirror / "abc123.zip"
    with zipfile.ZipFile(scene_zip, "w") as zf:
        zf.writestr("abc123/images_4/frame_00001.png", b"fakepng")
        zf.writestr("abc123/transforms.json", "{}")

    items = build_download_list(str(meta), "1K", "", "960P", "images+poses")
    assert items == [{"repo": "DL3DV/DL3DV-ALL-960P",
                      "rel_path": "1K/abc123.zip"}]
    # single-hash mode ignores the subset
    items_h = build_download_list(str(meta), "1K", "def456", "480P",
                                  "images+poses")
    assert items_h[0]["rel_path"] == "2K/def456.zip"

    out = tmp_path / "out"
    tmpl = f"file://{tmp_path}/mirror/" + "{repo}/{rel_path}"
    assert download(items, str(out), tmpl) == 1
    assert (out / "1K" / "abc123" / "transforms.json").exists()
    assert not (out / "1K" / "abc123.zip").exists()  # removed after unzip

    # unzip_dir flavor
    zips = tmp_path / "zips"
    zips.mkdir()
    with zipfile.ZipFile(zips / "s.zip", "w") as zf:
        zf.writestr("sceneX/f.txt", "x")
    out2 = tmp_path / "out2"
    unzip_dir(str(zips), str(out2))
    assert (out2 / "sceneX" / "f.txt").exists()


def test_generate_depths_cli(tmp_path):
    """tools/generate_depths.py end to end with the luminance proxy teacher
    (the DA-v2 path differs only in the depth_fn, parity-tested elsewhere)."""
    import subprocess

    rng = np.random.default_rng(0)
    root = tmp_path / "frames"
    (root / "sceneA").mkdir(parents=True)
    frames = []
    for i in range(3):
        f = f"sceneA/f{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(root / f)
        frames.append(f)
    ann = {"sceneA": {"frames": frames, "poses": [np.eye(4)[:3].tolist()] * 3,
                      "intrinsics": [[50, 50, 20, 20]] * 3,
                      "captions": ["a scene"]}}
    ann_path = tmp_path / "ann.pkl"
    with open(ann_path, "wb") as fp:
        pickle.dump(ann, fp)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "generate_depths.py"),
         "--root", str(root), "--annotation", str(ann_path),
         "--out", str(tmp_path / "depths"), "--size", "32", "--batch", "2"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    new_ann = pickle.load(open(str(ann_path) + ".depth.pkl", "rb"))
    depths = new_ann["sceneA"]["depths"]
    assert len(depths) == 3
    d = np.load(tmp_path / "depths" / depths[0]).astype(np.float32)
    assert d.shape == (32, 32)
    assert 0.0 <= d.min() and d.max() <= 1.0
