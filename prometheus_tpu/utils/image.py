"""Image post-processing/export utilities.

Parity targets: ``/root/reference/prometheus/utils/image_utils.py``
(``postprocess_image``, ``colorize_depth_maps``, grid assembly). Kept
dependency-light: numpy + PIL + a small built-in spectral colormap (no
matplotlib requirement at runtime).
"""
from __future__ import annotations

import numpy as np
from PIL import Image

# A compact Spectral_r-like colormap (matplotlib's Spectral reversed),
# 11 anchor colors, linearly interpolated.
_SPECTRAL_R = np.asarray([
    (94, 79, 162), (50, 136, 189), (102, 194, 165), (171, 221, 164),
    (230, 245, 152), (255, 255, 191), (254, 224, 139), (253, 174, 97),
    (244, 109, 67), (213, 62, 79), (158, 1, 66),
], np.float32) / 255.0


def postprocess_image(img, lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """(…, 3, H, W) in [lo, hi] -> uint8 (…, H, W, 3)."""
    arr = np.asarray(img, np.float32)
    arr = (arr - lo) / (hi - lo)
    arr = np.clip(arr, 0.0, 1.0)
    arr = np.moveaxis(arr, -3, -1)
    return (arr * 255).round().astype(np.uint8)


def colorize_depth(depth, lo: float | None = None, hi: float | None = None,
                   cmap: np.ndarray = _SPECTRAL_R) -> np.ndarray:
    """(…, H, W) depth/disparity -> uint8 (…, H, W, 3) colormapped."""
    d = np.asarray(depth, np.float32)
    lo = float(d.min()) if lo is None else lo
    hi = float(d.max()) if hi is None else hi
    t = np.clip((d - lo) / max(hi - lo, 1e-8), 0.0, 1.0)
    x = t * (len(cmap) - 1)
    i0 = np.floor(x).astype(np.int32)
    i1 = np.minimum(i0 + 1, len(cmap) - 1)
    frac = (x - i0)[..., None]
    rgb = cmap[i0] * (1 - frac) + cmap[i1] * frac
    return (rgb * 255).round().astype(np.uint8)


def make_grid(images: np.ndarray, cols: int | None = None,
              pad: int = 2, pad_value: int = 255) -> np.ndarray:
    """(N, H, W, 3) uint8 -> one tiled grid image."""
    n, h, w, c = images.shape
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = -(-n // cols)
    grid = np.full((rows * (h + pad) - pad, cols * (w + pad) - pad, c),
                   pad_value, np.uint8)
    for i in range(n):
        r, cc = divmod(i, cols)
        grid[r * (h + pad) : r * (h + pad) + h,
             cc * (w + pad) : cc * (w + pad) + w] = images[i]
    return grid


def save_image(arr: np.ndarray, path: str):
    Image.fromarray(arr).save(path)


def load_image(path: str) -> np.ndarray:
    """PNG/JPEG -> uint8 (H, W, 3) — inverse of ``save_image``."""
    return np.asarray(Image.open(path).convert("RGB"))


def save_video(frames: np.ndarray, path: str, fps: int = 30) -> str:
    """(T, H, W, 3) uint8 -> mp4 (imageio/ffmpeg if available) or an
    animated GIF fallback; returns the actual path written."""
    try:
        import imageio.v3 as iio

        iio.imwrite(path, frames, fps=fps)
        return path
    except Exception:
        gif = path.rsplit(".", 1)[0] + ".gif"
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return gif
