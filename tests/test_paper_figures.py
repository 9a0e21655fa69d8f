"""Paper-figure tool (reference ``paper/{teaser,method_stage*,prepare_lsun}``
analogs): stage panels, teaser grids, webp conversion."""
import os
import subprocess
import sys

import numpy as np
from PIL import Image

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "paper_figures.py")


def _views(d, n=3, h=24, w=32, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(os.path.join(d, f"view_{i:02d}.png"))


def test_stage_figure(tmp_path):
    scene = tmp_path / "scene"
    _views(scene / "inputs", 3)
    _views(scene / "renders", 3, seed=1)
    os.makedirs(scene / "depth")
    np.save(scene / "depth" / "000000.npy", np.random.rand(24, 32))
    out = tmp_path / "fig.png"
    r = subprocess.run(
        [sys.executable, TOOL, "figure", "--scene_dir", str(scene),
         "--out", str(out)], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    with Image.open(out) as im:
        w, h = im.size
    assert h == 3 * 24 + 2 * 4 and w == 3 * 32 + 2 * 4  # 3 rows x 3 cols

    # color-coded borders: first view framed with the first Spectral stop
    arr = np.asarray(Image.open(out))
    assert tuple(arr[0, 0]) == (158, 1, 66)


def test_teaser_grid(tmp_path):
    gal = tmp_path / "gallery"
    for p in ("a_red_cube", "a_blue_ball"):
        _views(gal / p, 6)
    out = tmp_path / "teaser.png"
    r = subprocess.run(
        [sys.executable, TOOL, "teaser", "--gallery_dir", str(gal),
         "--out", str(out), "--views_per_prompt", "4"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    with Image.open(out) as im:
        assert im.size == (4 * 32 + 3 * 4, 2 * 24 + 4)  # 2 prompts x 4 views


def test_convert_webp(tmp_path):
    src = tmp_path / "src" / "nested"
    os.makedirs(src)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        src / "a.webp", "WEBP")
    dst = tmp_path / "dst"
    r = subprocess.run(
        [sys.executable, TOOL, "convert", "--src", str(tmp_path / "src"),
         "--dst", str(dst)], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "converted 1" in r.stdout
    with Image.open(dst / "a.jpg") as im:
        assert im.format == "JPEG"
