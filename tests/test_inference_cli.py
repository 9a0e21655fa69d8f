"""inference.py CLI end-to-end: prompt loop, exports, --num_samples layout.

Parity target: ``/root/reference/inference.py:140-205`` (per-prompt sample
loop — ``num_samples`` independent TrajDiT trajectories + denoise draws per
prompt, each exported under ``<prompt>/<sample_idx>/``).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_inference(export_dir, extra_args=()):
    argv = ["inference.py", "--prompt", "a tiny red barn",
            "--export_dir", str(export_dir), "--small",
            "--num_steps", "2", "--num_traj_steps", "2",
            "--num_views", "2", "--render_size", "64",
            "--image_size", "64", "--no_video", *extra_args]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        f"import sys; sys.argv = {argv!r};\n"
        "import inference; inference.main()"
    )
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=1200)


@pytest.mark.slow
def test_inference_cli_num_samples(tmp_path):
    export_dir = tmp_path / "out"
    r = _run_inference(export_dir, ("--num_samples", "2"))
    assert r.returncode == 0, r.stderr[-2000:]

    (prompt_dir,) = list(export_dir.iterdir())
    sample_dirs = sorted(d.name for d in prompt_dir.iterdir())
    assert sample_dirs == ["0", "1"]
    from PIL import Image

    renders = []
    for s in sample_dirs:
        d = prompt_dir / s
        for f in ("gs_renders.png", "mv_images.png", "mv_depths.png",
                  "gaussians.ply", "gaussians.splat"):
            assert (d / f).exists(), (s, f)
        meta = json.loads((d / "meta.json").read_text())
        assert meta["prompt"] == "a tiny red barn"
        renders.append(np.asarray(Image.open(d / "gs_renders.png")))
    # the two samples use distinct fold-in keys -> different scenes
    assert not np.array_equal(renders[0], renders[1])
