import random

import numpy as np

from prometheus_tpu.datasets.transforms import (
    adjust_hsv,
    gaussian_blur,
    hflip,
    hflip_camera,
    jpeg_compress,
    random_crop_and_resize,
)


def test_random_crop_and_resize(rng):
    img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    r = random.Random(0)
    out, intr = random_crop_and_resize(img, 32, r,
                                       intrinsics=np.asarray([60., 60., 32., 24.]))
    assert out.shape == (32, 32, 3)
    assert intr is not None and intr[0] > 0


def test_adjust_hsv_identity(rng):
    img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    out = adjust_hsv(img, 0.0, 0.0, 0.0)
    # HSV round-trip is lossy but close
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_adjust_hsv_value_scale(rng):
    img = np.full((8, 8, 3), 100, np.uint8)
    brighter = adjust_hsv(img, 0.0, 0.0, 0.5)
    assert brighter.mean() > img.mean()


def test_gaussian_blur_smooths(rng):
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    out = gaussian_blur(img, 2.0)
    assert out.std() < img.std()


def test_jpeg_compress_lossy(rng):
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    out = jpeg_compress(img, quality=30)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() > 1


def test_hflip_and_camera():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    flipped = hflip(img)
    np.testing.assert_array_equal(flipped[:, 0], img[:, -1])
    cam = np.zeros(18, np.float32)
    cam[:12] = np.eye(3, 4).reshape(-1)
    cam[12:] = [10, 10, 3, 2, 8, 8]
    out = hflip_camera(cam)
    assert out[14] == 8 - 3  # cx mirrored
