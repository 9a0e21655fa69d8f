"""tools/dataset_gallery.py smoke: per-scene caption + frames strip +
trajectory plot -> one HTML index (the vis/get_mv_datasets_texttraj analog)."""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dataset_gallery_cli(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_loader import build_dataset

    root = str(tmp_path / "scenes")
    os.makedirs(root)
    build_dataset(root, 2, 6, (90, 120), np.random.default_rng(0))

    out = str(tmp_path / "gallery")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/dataset_gallery.py", "--root", root,
         "--annotation", os.path.join(root, "annotation.pkl"),
         "--num_scenes", "2", "--views", "3", "--img_size", "64",
         "--out", out],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr
    html = open(os.path.join(out, "index.html")).read()
    assert "synthetic scene" in html           # captions present
    assert os.path.exists(os.path.join(out, "000_frames.png"))
    assert os.path.exists(os.path.join(out, "000_traj.png"))
    assert os.path.exists(os.path.join(out, "001_traj.png"))
