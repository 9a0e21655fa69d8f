"""Data-pipeline tests over synthetic on-disk fixtures."""
import json
import os
import pickle
import zipfile

import numpy as np
import pytest
from PIL import Image

from prometheus_tpu.datasets import (
    DataLoader,
    DL3DV10KDataset,
    JointDataset,
    ProbDataset,
    RealEstate10KDataset,
    Text2ImageDataset,
    clean_caption,
    default_collate,
    make_reader,
)
from prometheus_tpu.datasets.transforms import (
    center_crop_and_resize,
    decode_image,
    normalize_image,
)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def save_jpg(path, rng, hw=(48, 64)):
    arr = rng.integers(0, 255, size=hw + (3,), dtype=np.uint8)
    Image.fromarray(arr).save(path, quality=92)


def make_orbit_poses(n, radius=2.0):
    """OpenGL look-at-origin c2ws (n, 3, 4)."""
    import jax.numpy as jnp

    from prometheus_tpu.utils import look_at

    az = np.linspace(0, np.pi, n)
    eye = np.stack([radius * np.cos(az), 0.2 * np.ones(n),
                    radius * np.sin(az)], -1)
    return np.asarray(look_at(jnp.asarray(eye), jnp.zeros((n, 3))))


@pytest.fixture(scope="module")
def scenes_root(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("dl3dv")
    ann = {}
    for s in range(3):
        scene = f"scene_{s}"
        os.makedirs(root / scene, exist_ok=True)
        frames = []
        n = 12
        for i in range(n):
            f = f"{scene}/frame_{i:03d}.jpg"
            save_jpg(root / f, rng)
            frames.append(f)
        ann[scene] = {
            "frames": frames,
            "poses": make_orbit_poses(n).tolist(),
            "intrinsics": [60.0, 60.0, 32.0, 24.0],
            "captions": [f"a synthetic scene {s}"],
        }
    ann_path = root / "annotation.pkl"
    with open(ann_path, "wb") as fp:
        pickle.dump(ann, fp)
    return str(root), str(ann_path)


@pytest.fixture(scope="module")
def t2i_root(tmp_path_factory):
    rng = np.random.default_rng(1)
    root = tmp_path_factory.mktemp("t2i")
    items = []
    for i in range(6):
        f = f"img_{i}.jpg"
        save_jpg(root / f, rng)
        items.append({"file": f, "caption": f"the image shows a thing {i}"})
    with open(root / "annotations.json", "w") as fp:
        json.dump(items, fp)
    return str(root)


# ---------------------------------------------------------------------------
# transforms / readers
# ---------------------------------------------------------------------------

def test_center_crop_resize_intrinsics(rng):
    img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    out, intr = center_crop_and_resize(img, 32, np.asarray([60., 60., 32., 24.]))
    assert out.shape == (32, 32, 3)
    # crop takes central 48x48 (left=8), scale 32/48
    np.testing.assert_allclose(intr[0], 60 * 32 / 48, rtol=1e-6)
    np.testing.assert_allclose(intr[2], (32 - 8) * 32 / 48, rtol=1e-6)


def test_normalize_image(rng):
    img = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
    out = normalize_image(img)
    assert out.shape == (3, 8, 8)
    assert out.min() >= -1 and out.max() <= 1


def test_fused_crop_resize_normalize_paths_agree(rng):
    """The fused hot-path transform: native and pure-python paths produce
    the same intrinsics (exactly) and closely-agreeing pixels; both match
    the legacy two-step path's intrinsics math."""
    import os

    from prometheus_tpu.datasets.transforms import crop_resize_normalize

    # structured content: filter choice (triangle-AA vs LANCZOS) only
    # matters near the Nyquist band, so compare on natural-ish frequencies
    yy, xx = np.mgrid[0:48, 0:64]
    img = (127 + 70 * np.sin(yy / 5.0) + 50 * np.cos(xx / 7.0)
           + rng.normal(0, 10, (48, 64))).clip(0, 255)
    img = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)],
                   -1).astype(np.uint8)
    intr0 = np.asarray([60.0, 60.0, 32.0, 24.0])
    out_n, intr_n = crop_resize_normalize(img, 32, intr0.copy())
    os.environ["PROMETHEUS_NATIVE"] = "0"
    try:
        out_p, intr_p = crop_resize_normalize(img, 32, intr0.copy())
    finally:
        os.environ.pop("PROMETHEUS_NATIVE", None)
    _, intr_ref = center_crop_and_resize(img, 32, intr0.copy())
    np.testing.assert_allclose(intr_n, intr_ref, rtol=1e-6)
    np.testing.assert_allclose(intr_p, intr_ref, rtol=1e-6)
    assert out_n.shape == out_p.shape == (3, 32, 32)
    assert out_n.dtype == out_p.dtype == np.float32
    assert np.abs(out_n - out_p).mean() < 0.03  # triangle-AA vs LANCZOS


def test_zip_reader(tmp_path, rng):
    zpath = str(tmp_path / "data.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("a/b.txt", b"hello")
    r = make_reader(zpath)
    assert r.fetch("a/b.txt") == b"hello"
    assert r.exists("a/b.txt") and not r.exists("nope")
    assert r.list() == ["a/b.txt"]


def test_clean_caption():
    assert clean_caption("The image shows a red car.") == "A red car."
    assert clean_caption("  hello   world ") == "Hello world"


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

def test_dl3dv_dataset(scenes_root):
    root, ann = scenes_root
    ds = DL3DV10KDataset(root, annotation_path=ann, img_size=32,
                         num_input_views=4, num_novel_views=2, sample_rate=2)
    assert len(ds) == 3
    item = ds[0]
    assert item["images_mv"].shape == (6, 3, 32, 32)
    assert item["cameras_mv"].shape == (6, 18)
    assert item["text_mv"].startswith("a synthetic scene")
    # normalized cameras: first pose ~ identity
    c2w0 = item["cameras_mv"][0, :12].reshape(3, 4)
    np.testing.assert_allclose(c2w0[:, :3], np.eye(3), atol=1e-4)
    np.testing.assert_allclose(c2w0[:, 3], 0.0, atol=1e-4)


def test_dataset_fake_length(scenes_root):
    root, ann = scenes_root
    ds = DL3DV10KDataset(root, annotation_path=ann, img_size=32,
                         num_input_views=2, num_novel_views=0,
                         fake_length=100)
    assert len(ds) == 100
    _ = ds[50]  # wraps around inner length


def test_scene_scale_rejection_retries(scenes_root):
    root, ann = scenes_root
    # threshold higher than any synthetic scene's motion -> every scene
    # raises -> retry loop exhausts -> RuntimeError
    ds = DL3DV10KDataset(root, annotation_path=ann, img_size=32,
                         num_input_views=4, num_novel_views=0,
                         scene_scale_threshold=1e9, max_retries=3)
    with pytest.raises(RuntimeError):
        _ = ds[0]


def test_t2i_dataset(t2i_root):
    ds = Text2ImageDataset(t2i_root, images_per_iter=2, img_size=32)
    item = ds[0]
    assert item["images_sv"].shape == (2, 3, 32, 32)
    assert len(item["text_sv"]) == 2
    assert item["text_sv"][0].startswith("A thing")


def test_t2i_reference_csv_shards(tmp_path, rng):
    """Text2ImageDataset consumes the reference's sharded CSV metadata
    ([Image Name, Image Path, Caption] rows — tools/sa1b/build_metadata.py)
    directly, no conversion needed."""
    import csv

    root = tmp_path / "sam"
    os.makedirs(root / "metadata")
    for i in range(4):
        save_jpg(root / f"img_{i}.jpg", rng)
    for shard in range(2):
        with open(root / "metadata" /
                  f"filenames_and_captions_full_{shard}.csv", "w",
                  newline="") as fp:
            w = csv.writer(fp)
            w.writerow(["Image Name", "Image Path", "Caption"])
            for i in range(2 * shard, 2 * shard + 2):
                w.writerow([f"img_{i}.jpg", f"img_{i}.jpg",
                            f"a csv caption {i}"])
    ds = Text2ImageDataset(str(root), images_per_iter=2, img_size=32)
    assert ds.inner_len() == 4
    item = ds[0]
    assert item["images_sv"].shape == (2, 3, 32, 32)
    assert item["text_sv"][0].startswith("A csv caption")


def test_t2i_captions_ingest(tmp_path, rng):
    """tools/build_metadata.py t2i-captions: SAM-1B/JourneyDB caption
    sidecars -> annotations.json consumed by Text2ImageDataset."""
    import subprocess
    import sys

    root = tmp_path / "jdb"
    os.makedirs(root / "captions")
    for i in range(3):
        save_jpg(root / f"pic_{i}.jpg", rng)
        if i < 2:  # one image without a caption -> skipped
            with open(root / "captions" / f"pic_{i}.txt", "w") as fp:
                fp.write(f"the photo shows a sidecar thing {i}\n")
    out = str(root / "annotations.json")
    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "build_metadata.py")
    proc = subprocess.run(
        [sys.executable, tool, "t2i-captions", "--root", str(root),
         "--out", out], capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-1500:]
    ds = Text2ImageDataset(str(root), images_per_iter=2, img_size=32)
    assert ds.inner_len() == 2
    item = ds[0]
    assert item["text_sv"][0].startswith("A sidecar thing")


def test_re10k_torch_chunks(tmp_path, rng):
    import io

    import torch

    root = tmp_path / "re10k"
    os.makedirs(root)
    n = 6
    poses_gl = make_orbit_poses(n)
    from prometheus_tpu.utils import opengl_to_opencv

    scenes = []
    for key in ["aaa", "bbb"]:
        images = []
        for i in range(n):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (36, 64, 3), dtype=np.uint8)
                            ).save(buf, format="JPEG")
            images.append(torch.frombuffer(bytearray(buf.getvalue()),
                                           dtype=torch.uint8))
        cams = []
        for i in range(n):
            c2w_cv = np.asarray(opengl_to_opencv(poses_gl[i]))
            w2c = np.linalg.inv(np.vstack([c2w_cv, [[0, 0, 0, 1]]]))[:3]
            cams.append(np.concatenate([
                [0.9, 1.2, 0.5, 0.5, 0.0, 0.0], w2c.reshape(-1)]))
        scenes.append({"key": key, "images": images,
                       "cameras": torch.tensor(np.stack(cams), dtype=torch.float32)})
    torch.save(scenes, root / "000000.torch")
    with open(root / "index.json", "w") as fp:
        json.dump({"aaa": "000000.torch", "bbb": "000000.torch"}, fp)

    ds = RealEstate10KDataset(str(root), img_size=32, num_input_views=3,
                              num_novel_views=0, sample_rate=2,
                              scene_scale_threshold=0.0)
    item = ds[0]
    assert item["images_mv"].shape == (3, 3, 32, 32)
    assert item["cameras_mv"].shape == (3, 18)
    assert np.isfinite(item["cameras_mv"]).all()


# ---------------------------------------------------------------------------
# mixers + loader
# ---------------------------------------------------------------------------

def test_joint_and_prob(scenes_root, t2i_root):
    root, ann = scenes_root
    mv = DL3DV10KDataset(root, annotation_path=ann, img_size=32,
                         num_input_views=2, num_novel_views=0)
    t2i = Text2ImageDataset(t2i_root, images_per_iter=2, img_size=32)
    prob = ProbDataset([mv, mv], probs=[0.7, 0.3])
    item = prob[0]
    assert "images_mv" in item
    joint = JointDataset([prob, t2i])
    item = joint[1]
    assert "images_mv" in item and "images_sv" in item


def test_dataloader(scenes_root):
    root, ann = scenes_root
    ds = DL3DV10KDataset(root, annotation_path=ann, img_size=32,
                         num_input_views=2, num_novel_views=0, fake_length=8)
    dl = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["images_mv"].shape == (4, 2, 3, 32, 32)
    assert b["cameras_mv"].shape == (4, 2, 18)
    assert isinstance(b["text_mv"], list) and len(b["text_mv"]) == 4


def test_dataloader_propagates_errors(scenes_root):
    root, ann = scenes_root

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise ValueError("boom")

    dl = DataLoader(Bad(), batch_size=2, num_workers=2)
    with pytest.raises(ValueError):
        list(dl)
