"""End-to-end: train.py's dataset path over on-disk synthetic scenes."""
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from prometheus_tpu.datasets.builder import build_dataset, common_kwargs_from_group


@pytest.fixture(scope="module")
def scenes(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("scenes")
    import jax.numpy as jnp

    from prometheus_tpu.utils import look_at

    ann = {}
    for s in range(2):
        scene = f"s{s}"
        os.makedirs(root / scene)
        n = 8
        az = np.linspace(0, np.pi, n)
        eye = np.stack([2 * np.cos(az), 0.2 * np.ones(n), 2 * np.sin(az)], -1)
        poses = np.asarray(look_at(jnp.asarray(eye), jnp.zeros((n, 3))))
        frames = []
        for i in range(n):
            f = f"{scene}/f{i}.jpg"
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                            ).save(root / f)
            frames.append(f)
        ann[scene] = {"frames": frames, "poses": poses.tolist(),
                      "intrinsics": [50.0, 50.0, 20.0, 20.0],
                      "captions": ["a synthetic scene"]}
    with open(root / "ann.pkl", "wb") as fp:
        pickle.dump(ann, fp)
    return str(root)


def test_build_dataset_tree(scenes):
    node = {
        "module": "prometheus_tpu.datasets.ProbDataset",
        "datasets": [
            {"module": "prometheus_tpu.datasets.DL3DV10KDataset",
             "args": {"root_dir": scenes,
                      "annotation_path": os.path.join(scenes, "ann.pkl")}},
        ],
        "probs": [1.0],
    }
    ds = build_dataset(node, {"img_size": 32, "num_input_views": 2,
                              "num_novel_views": 0})
    item = ds[0]
    assert item["images_mv"].shape == (2, 3, 32, 32)


@pytest.mark.slow
def test_train_cli_from_disk(scenes, tmp_path):
    """One real train step sourced from an on-disk dataset config.

    Runs in a SINGLE-device subprocess: under the suite's 8-device virtual
    mesh, train.py scales the global batch to the device count, which is 8x
    the work this smoke needs."""
    import subprocess
    import sys

    # compose a minimal config using the real loader + overrides
    cfg_dir = tmp_path / "configs"
    (cfg_dir / "experiment").mkdir(parents=True)
    (cfg_dir / "dataset").mkdir()
    (cfg_dir / "algorithm").mkdir()
    with open(cfg_dir / "config.yaml", "w") as fp:
        fp.write(
            "defaults:\n  experiment: exp\n  dataset: ds\n"
            "seed: 0\nimage_size: 32\noutput_dir: " + str(tmp_path) + "\n")
    with open(cfg_dir / "experiment" / "exp.yaml", "w") as fp:
        fp.write(
            "scheduler_type: vprediction\n"
            "training:\n  learning_rate: 1.0e-4\n  batch_size: 1\n"
            "  num_input_views: 2\n  num_novel_views: 0\n"
            "  num_pred_views: 2\n  num_workers: 1\n"
            "  resume_from_checkpoint: none\n")
    with open(cfg_dir / "dataset" / "ds.yaml", "w") as fp:
        fp.write(
            "image_size: 32\nnum_input_views: 2\nnum_novel_views: 0\n"
            "use_caption: true\n"
            "train:\n  module: prometheus_tpu.datasets.DL3DV10KDataset\n"
            f"  args: {{root_dir: {scenes}, "
            f"annotation_path: {os.path.join(scenes, 'ann.pkl')}, "
            "fake_length: 4}\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys;\n"
        f"sys.argv = ['train.py','--config',{str(cfg_dir / 'config.yaml')!r},"
        "'--stage','mvldm','--small','--max_steps','1','--log_every','1',"
        f"'--save_every','-1','--depth_teacher','luminance','--ckpt_dir',"
        f"{str(tmp_path / 'ck')!r}];\n"
        "import train; train.main()"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single device
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # a metrics line was logged -> the step ran from disk data
    log = os.path.join(str(tmp_path / "ck"), "metrics.jsonl")
    line = json.loads(open(log).readline())
    assert "loss" in line and np.isfinite(line["loss"])


@pytest.mark.slow
def test_train_cli_joint_sv_from_disk(scenes, tmp_path):
    """Joint MV + T2I training FROM DISK: a JointDataset merges a multi-view
    scene child with a Text2ImageDataset child, and train.py's
    host_batch_to_device passes the single-view images/captions through
    (teacher depths + per-image text embeddings), so single_view_loss fires
    every step — the reference's mixed-batch semantics
    (mv_ldm_system.py:112-143)."""
    import subprocess
    import sys

    # on-disk T2I child
    rng = np.random.default_rng(1)
    t2i_root = tmp_path / "t2i"
    t2i_root.mkdir()
    items = []
    for i in range(6):
        f = f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
                        ).save(t2i_root / f)
        items.append({"file": f, "caption": f"a photo number {i}"})
    with open(t2i_root / "annotations.json", "w") as fp:
        json.dump(items, fp)

    cfg_dir = tmp_path / "configs"
    (cfg_dir / "experiment").mkdir(parents=True)
    (cfg_dir / "dataset").mkdir()
    with open(cfg_dir / "config.yaml", "w") as fp:
        fp.write(
            "defaults:\n  experiment: exp\n  dataset: ds\n"
            "seed: 0\nimage_size: 32\noutput_dir: " + str(tmp_path) + "\n")
    with open(cfg_dir / "experiment" / "exp.yaml", "w") as fp:
        fp.write(
            "scheduler_type: vprediction\n"
            "training:\n  learning_rate: 1.0e-4\n  batch_size: 1\n"
            "  num_input_views: 2\n  num_novel_views: 0\n"
            "  num_pred_views: 2\n  num_workers: 1\n"
            "  resume_from_checkpoint: none\n")
    with open(cfg_dir / "dataset" / "ds.yaml", "w") as fp:
        fp.write(
            "image_size: 32\nnum_input_views: 2\nnum_novel_views: 0\n"
            "use_caption: true\n"
            "train:\n  module: prometheus_tpu.datasets.JointDataset\n"
            "  datasets:\n"
            "    - module: prometheus_tpu.datasets.DL3DV10KDataset\n"
            f"      args: {{root_dir: {scenes}, "
            f"annotation_path: {os.path.join(scenes, 'ann.pkl')}, "
            "fake_length: 4}\n"
            "    - module: prometheus_tpu.datasets.Text2ImageDataset\n"
            f"      args: {{root_dir: {str(t2i_root)}, "
            "images_per_iter: 2, fake_length: 4}\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys;\n"
        f"sys.argv = ['train.py','--config',{str(cfg_dir / 'config.yaml')!r},"
        "'--stage','mvldm','--small','--max_steps','1','--log_every','1',"
        f"'--save_every','-1','--depth_teacher','luminance','--ckpt_dir',"
        f"{str(tmp_path / 'ck')!r}];\n"
        "import train; train.main()"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single device
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    log = os.path.join(str(tmp_path / "ck"), "metrics.jsonl")
    line = json.loads(open(log).readline())
    assert "loss" in line and np.isfinite(line["loss"])
    # the single-view branch actually fired (sv_* metrics present)
    sv_keys = [k for k in line if k.startswith("sv_")]
    assert sv_keys, f"single-view loss did not fire: {sorted(line)}"
