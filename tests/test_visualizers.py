"""gif/grid training-snapshot visualizer analogs.

Parity targets: the reference's ``GifVisualizer`` and ``GridVisualizer``
(``/root/reference/prometheus/utils/visualizers/{gif,grid}_visualizer.py``) —
animated-GIF export of an image collection with per-frame resize, and a
cell-addressable grid compositor with spacing/background, plus their
MetricLogger wiring (the training-snapshot sink).
"""
import numpy as np
from PIL import Image

from prometheus_tpu.logging_utils import MetricLogger
from prometheus_tpu.utils.image import ImageGrid, save_gif


def _frames(n=4, h=16, w=20):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_save_gif_roundtrip(tmp_path):
    path = str(tmp_path / "anim.gif")
    out = save_gif(_frames(), path, duration_ms=50)
    assert out == path
    with Image.open(path) as im:
        assert im.format == "GIF"
        assert im.n_frames == 4
        assert im.size == (20, 16)


def test_save_gif_resizes_to_fixed_size(tmp_path):
    frames = [_frames(1, 16, 20)[0], _frames(1, 8, 10)[0]]
    path = save_gif(frames, str(tmp_path / "r.gif"), size=(32, 40))
    with Image.open(path) as im:
        assert im.size == (40, 32)  # PIL size is (W, H)
        assert im.n_frames == 2


def test_image_grid_compose_layout():
    grid = ImageGrid(2, 3, spacing=2, background=0)
    cell = np.full((8, 8, 3), 200, np.uint8)
    for r in range(2):
        for c in range(3):
            grid.add(r, c, cell)
    out = grid.compose()
    assert out.shape == (2 * 10 - 2, 3 * 10 - 2, 3)
    assert (out[0:8, 0:8] == 200).all()
    assert (out[8:10, :] == 0).all()          # row spacing
    assert (out[0:8, 8:10] == 0).all()        # col spacing
    assert (out[10:18, 20:28] == 200).all()   # cell (1, 2)


def test_image_grid_resizes_and_empty_cells():
    grid = ImageGrid(1, 2, background=255)
    grid.add(0, 0, np.zeros((8, 8, 3), np.uint8))
    grid.add(0, 1, np.zeros((4, 4, 3), np.uint8))  # resized up to 8x8
    out = grid.compose()
    assert out.shape == (8, 16, 3)
    assert (out[:, 8:] == 0).all()

    sparse = ImageGrid(1, 2)
    sparse.add(0, 0, np.zeros((4, 4, 3), np.uint8))
    assert (sparse.compose()[:, 4:] == 255).all()  # unfilled -> background


def test_metric_logger_gif_and_grid(tmp_path):
    logger = MetricLogger(str(tmp_path))
    logger.log_gif("val/views", _frames(3), step=7)
    logger.log_grid("val/nvs", [_frames(2), _frames(2)], step=7)
    snaps = sorted(p.name for p in (tmp_path / "snapshots").iterdir())
    assert snaps == ["000000007_val_nvs.png", "000000007_val_views.gif"]
    with Image.open(tmp_path / "snapshots" / snaps[1]) as im:
        assert im.n_frames == 3


def test_metric_logger_rank_nonzero_writes_nothing(tmp_path):
    logger = MetricLogger(str(tmp_path / "nz"), rank_zero=False)
    logger.log_gif("x", _frames(2), step=0)
    logger.log_grid("y", [_frames(1)], step=0)
    assert not (tmp_path / "nz").exists()
