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


def _synth_jpeg(h=720, w=960, quality=90):
    import io

    from PIL import Image

    yy, xx = np.mgrid[0:h, 0:w]
    arr = (127 + 80 * np.sin(yy / 7) + 60 * np.cos(xx / 11)
           + np.random.default_rng(0).normal(0, 8, (h, w))).clip(0, 255)
    img = np.stack([arr, np.roll(arr, 7, 0), np.roll(arr, 3, 1)],
                   -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_image_draft_quality_and_intrinsics():
    from prometheus_tpu.datasets.transforms import (crop_resize_normalize,
                                                    decode_image,
                                                    decode_image_draft)

    data = _synth_jpeg()
    intr_full = np.asarray([800.0, 800.0, 480.0, 360.0], np.float32)

    # full-res reference pipeline
    ref_img, ref_intr = crop_resize_normalize(decode_image(data), 256,
                                              intr_full.copy())
    # DCT-downscaled decode (720p -> 256 target picks the 1/2 scale)
    raw, (sx, sy) = decode_image_draft(data, 256)
    assert raw.shape[0] < 720  # draft actually engaged
    out_img, out_intr = crop_resize_normalize(
        raw, 256, intr_full * np.asarray([sx, sy, sx, sy], np.float32))

    mse = float(np.mean((ref_img - out_img) ** 2))
    psnr = 10 * np.log10(4.0 / mse)  # [-1, 1] range
    assert psnr > 40.0, psnr
    # final intrinsics are in target coords on both paths
    np.testing.assert_allclose(out_intr, ref_intr, rtol=1e-5)


def test_decode_image_draft_noop_cases(monkeypatch):
    import io

    from PIL import Image

    from prometheus_tpu.datasets.transforms import (decode_image,
                                                    decode_image_draft)

    data = _synth_jpeg()
    # already near target -> exact full decode
    raw, (sx, sy) = decode_image_draft(data, 512)
    np.testing.assert_array_equal(raw, decode_image(data))
    assert (sx, sy) == (1.0, 1.0)

    # env kill-switch -> exact full decode even when draft would engage
    monkeypatch.setenv("PROMETHEUS_JPEG_DRAFT", "0")
    raw, _ = decode_image_draft(data, 128)
    np.testing.assert_array_equal(raw, decode_image(data))
    monkeypatch.delenv("PROMETHEUS_JPEG_DRAFT")

    # non-JPEG sources never draft
    buf = io.BytesIO()
    Image.fromarray(decode_image(data)).save(buf, format="PNG")
    raw, (sx, sy) = decode_image_draft(buf.getvalue(), 128)
    assert raw.shape == (720, 960, 3) and (sx, sy) == (1.0, 1.0)


def test_decode_crop_resize_normalize_native_matches_python(monkeypatch):
    """The fully-native JPEG path (libjpeg decode fused into the C++
    transform) must agree with the Python decoder + transform, including
    both intrinsics conventions."""
    from prometheus_tpu import native
    from prometheus_tpu.datasets.transforms import (
        decode_crop_resize_normalize)

    data = _synth_jpeg()
    intr_px = np.asarray([800.0, 820.0, 470.0, 350.0], np.float32)
    intr_norm = intr_px / np.asarray([960, 720, 960, 720], np.float32)

    out_n = decode_crop_resize_normalize(data, 256, intr_px.copy())
    out_norm = decode_crop_resize_normalize(data, 256, intr_norm,
                                            normalized=True)
    monkeypatch.setenv("PROMETHEUS_NATIVE", "0")
    out_p = decode_crop_resize_normalize(data, 256, intr_px.copy())
    monkeypatch.delenv("PROMETHEUS_NATIVE")

    if native.available():
        # the python fallback resizes with PIL LANCZOS vs the C++ triangle
        # filter (documented ~42 dB agreement on textured content)
        mse = float(np.mean((out_n[0] - out_p[0]) ** 2))
        assert 10 * np.log10(4.0 / mse) > 38.0
    np.testing.assert_allclose(out_n[1], out_p[1], rtol=1e-5)
    # normalized intrinsics resolve to the same target-coordinate values
    np.testing.assert_allclose(out_norm[1], out_n[1], rtol=1e-5)

    # full-decode kill switch applies to the native path too
    monkeypatch.setenv("PROMETHEUS_JPEG_DRAFT", "0")
    out_full = decode_crop_resize_normalize(data, 256, intr_px.copy())
    monkeypatch.delenv("PROMETHEUS_JPEG_DRAFT")
    np.testing.assert_allclose(out_full[1], out_n[1], rtol=1e-5)
    mse = float(np.mean((out_full[0] - out_n[0]) ** 2))
    assert 10 * np.log10(4.0 / mse) > 40.0
