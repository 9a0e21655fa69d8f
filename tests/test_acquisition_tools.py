"""Dataset acquisition + metadata tooling (VERDICT r3 'tools breadth').

Covers tools/fetch_datasets.py (manifest fetch over file://, resume,
extraction) and the new build_metadata.py subcommands: binary-COLMAP
reading (MVImgNet's format), text/binary agreement, the mvimgnet batch
walk, and journeydb-csv resharding feeding Text2ImageDataset.
"""
import csv
import os
import pickle
import struct
import subprocess
import sys
import tarfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _quat_of(R):
    # w-first quaternion of a rotation matrix (for fixture writing)
    w = np.sqrt(max(1 + R[0, 0] + R[1, 1] + R[2, 2], 0)) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return [w, x, y, z]


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _scene_model(n=3):
    cams = {1: ("PINHOLE", 640, 480, [500.0, 510.0, 320.0, 240.0])}
    images = []
    for i in range(n):
        R = _rot(0.3 * i)
        t = [0.1 * i, -0.2 * i, 1.0 + i]
        images.append((i + 1, _quat_of(R), t, 1, f"frame_{i:03d}.jpg"))
    return cams, images


def write_colmap_text(d, cams, images):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.txt"), "w") as fp:
        fp.write("# comment\n")
        for cid, (model, w, h, p) in cams.items():
            fp.write(f"{cid} {model} {w} {h} " +
                     " ".join(map(str, p)) + "\n")
    with open(os.path.join(d, "images.txt"), "w") as fp:
        fp.write("# comment\n")
        for iid, q, t, cid, name in images:
            fp.write(f"{iid} " + " ".join(map(str, q)) + " " +
                     " ".join(map(str, t)) + f" {cid} {name}\n")
            fp.write("0.0 0.0 -1\n")  # 2D points line


def write_colmap_binary(d, cams, images):
    model_ids = {"SIMPLE_PINHOLE": 0, "PINHOLE": 1, "SIMPLE_RADIAL": 2}
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.bin"), "wb") as fp:
        fp.write(struct.pack("<Q", len(cams)))
        for cid, (model, w, h, p) in cams.items():
            fp.write(struct.pack("<ii", cid, model_ids[model]))
            fp.write(struct.pack("<QQ", w, h))
            fp.write(struct.pack(f"<{len(p)}d", *p))
    with open(os.path.join(d, "images.bin"), "wb") as fp:
        fp.write(struct.pack("<Q", len(images)))
        for iid, q, t, cid, name in images:
            fp.write(struct.pack("<i", iid))
            fp.write(struct.pack("<4d", *q))
            fp.write(struct.pack("<3d", *t))
            fp.write(struct.pack("<i", cid))
            fp.write(name.encode() + b"\x00")
            # two dummy 2D points to exercise the seek-past
            fp.write(struct.pack("<Q", 2))
            fp.write(struct.pack("<ddq", 1.0, 2.0, -1))
            fp.write(struct.pack("<ddq", 3.0, 4.0, 7))


def test_colmap_binary_matches_text(tmp_path):
    from build_metadata import _colmap_scene_entry

    cams, images = _scene_model()
    write_colmap_text(tmp_path / "text", cams, images)
    write_colmap_binary(tmp_path / "bin", cams, images)
    a = _colmap_scene_entry(str(tmp_path / "text"))
    b = _colmap_scene_entry(str(tmp_path / "bin"))
    assert a["frames"] == b["frames"] == [f"frame_{i:03d}.jpg"
                                          for i in range(3)]
    assert np.allclose(a["poses"], b["poses"], atol=1e-9)
    assert np.allclose(a["intrinsics"], b["intrinsics"])
    # c2w sanity: camera center = -R^T t
    R = _rot(0.3)
    c = -R.T @ np.asarray([0.1, -0.2, 2.0])
    assert np.allclose(np.asarray(a["poses"][1])[:, 3], c, atol=1e-9)


def test_colmap_sparse0_autolocate(tmp_path):
    from build_metadata import _colmap_scene_entry

    cams, images = _scene_model(2)
    write_colmap_binary(tmp_path / "scene" / "sparse" / "0", cams, images)
    e = _colmap_scene_entry(str(tmp_path / "scene"))
    assert len(e["frames"]) == 2


def test_mvimgnet_batch(tmp_path):
    from build_metadata import mvimgnet_annotations

    cams, images = _scene_model(2)
    for cat, scene in [("99", "0a1b"), ("99", "0c2d"), ("12", "xyz")]:
        sdir = tmp_path / "raw" / cat / scene
        write_colmap_binary(sdir / "sparse" / "0", cams, images)
        (sdir / "images").mkdir()
    # a broken scene must be skipped, not fatal
    (tmp_path / "raw" / "99" / "broken").mkdir()
    out = tmp_path / "mvimgnet.pkl"
    mvimgnet_annotations(str(tmp_path / "raw"), str(out))
    ann = pickle.load(open(out, "rb"))
    assert set(ann) == {"99/0a1b", "99/0c2d", "12/xyz"}
    assert ann["99/0a1b"]["frames"][0] == os.path.join(
        "99", "0a1b", "images", "frame_000.jpg")

    # category filter
    mvimgnet_annotations(str(tmp_path / "raw"), str(out), category="12")
    assert set(pickle.load(open(out, "rb"))) == {"12/xyz"}


def test_journeydb_csv_feeds_t2i(tmp_path):
    from build_metadata import journeydb_csv

    raw = tmp_path / "raw.csv"
    with open(raw, "w", newline="") as fp:
        w = csv.writer(fp)
        w.writerow(["path", "caption"])  # header skipped
        for i in range(7):
            w.writerow([f"data/JourneyDB/imgs/{i:03d}.jpg",
                        f"a scene number {i}"])
    journeydb_csv(str(raw), str(tmp_path / "out"), shard_size=3)
    meta = tmp_path / "out" / "metadata"
    shards = sorted(os.listdir(meta))
    assert len(shards) == 3  # 3 + 3 + 1
    rows = []
    for s in shards:
        with open(meta / s) as fp:
            r = list(csv.reader(fp))
        assert r[0] == ["Image Name", "Image Path", "Caption"]
        rows += r[1:]
    assert len(rows) == 7
    assert rows[0] == ["000.jpg", "imgs/000.jpg", "a scene number 0"]

    # the shards feed Text2ImageDataset directly (its CSV ingestion path)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from prometheus_tpu.datasets.t2i import Text2ImageDataset

    img_root = tmp_path / "images" / "imgs"
    img_root.mkdir(parents=True)
    from PIL import Image
    for i in range(7):
        Image.new("RGB", (32, 32), (10 * i, 0, 0)).save(
            img_root / f"{i:03d}.jpg")
    ds = Text2ImageDataset(root_dir=str(tmp_path / "images"),
                           annotation_path=str(meta), images_per_iter=1)
    assert len(ds.items) == 7
    item = ds[0]
    # caption-cleanup heuristics may recapitalize — compare case-folded
    assert item["text_sv"][0].lower().startswith("a scene number")
    assert item["images_sv"].shape[0] == 1


def test_fetch_file_mirror_resume_and_extract(tmp_path):
    mirror = tmp_path / "mirror"
    (mirror / "sub").mkdir(parents=True)
    (mirror / "a.txt").write_text("alpha")
    (mirror / "sub" / "b.txt").write_text("beta")
    with tarfile.open(mirror / "caps.tar.gz", "w:gz") as tf:
        p = tmp_path / "c0.txt"
        p.write_text("caption zero")
        tf.add(p, arcname="captions/c0.txt")
    manifest = tmp_path / "manifest.txt"
    manifest.write_text("# comment\na.txt\nsub/b.txt\ncaps.tar.gz\n")
    out = tmp_path / "out"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, os.path.join(REPO, "tools", "fetch_datasets.py"),
           "fetch", "--manifest", str(manifest), "--out", str(out),
           "--url_template", f"file://{mirror}/{{rel_path}}", "--extract"]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=120)
    assert r.returncode == 0, r.stderr
    assert (out / "a.txt").read_text() == "alpha"
    assert (out / "sub" / "b.txt").read_text() == "beta"
    assert (out / "captions" / "c0.txt").read_text() == "caption zero"

    # resume: second run skips everything (marker mtimes unchanged)
    before = (out / "a.txt").stat().st_mtime_ns
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=120)
    assert r2.returncode == 0 and "exists, skip a.txt" in r2.stdout
    assert (out / "a.txt").stat().st_mtime_ns == before

    # a missing manifest entry fails the run (exit 1), others still fetched
    manifest.write_text("a.txt\nmissing.bin\n")
    out2 = tmp_path / "out2"
    r3 = subprocess.run([*cmd[:6], str(out2), *cmd[7:]],
                        capture_output=True, text=True, env=env, timeout=120)
    assert r3.returncode == 1
    assert (out2 / "a.txt").exists() and not (out2 / "missing.bin").exists()
