"""Image transforms for the data pipeline (numpy/PIL; host-side).

Parity target: ``/root/reference/prometheus/datasets/transformations/`` —
decode, center-crop, resize, normalize, flip. Camera intrinsics are adjusted
alongside the pixel ops so the 18-dim camera vector stays consistent.
"""
from __future__ import annotations

import io
import os

import numpy as np
from PIL import Image


def decode_image(data: bytes) -> np.ndarray:
    """bytes -> (H, W, 3) uint8 RGB."""
    img = Image.open(io.BytesIO(data))
    return np.asarray(img.convert("RGB"))


def decode_image_draft(data: bytes, target: int):
    """Decode for a ``target``^2 training frame: JPEG sources decode at the
    largest libjpeg DCT downscale (1/2, 1/4, 1/8) that keeps the short side
    >= ``target`` (PIL draft mode), so the antialiased resample still strictly
    downsamples. ~1.8x decode+transform throughput at the DL3DV-style
    720p -> 256 shapes, 49 dB vs the full-res pipeline (JPEG's own quality-90
    noise floor is lower). Non-JPEG formats and frames already near ``target``
    decode exactly like :func:`decode_image`.

    Returns ``(arr, (sx, sy))`` where ``sx = decoded_w / original_w`` (and
    ``sy`` likewise) — multiply full-resolution pixel intrinsics
    ``[fx, cx] * sx, [fy, cy] * sy`` before the crop/resize intrinsics
    adjustment. Normalized intrinsics need no correction (they scale with
    whatever the decoded dims are). ``PROMETHEUS_JPEG_DRAFT=0`` disables the
    scaled decode (exact reference-pipeline pixels, for A/B)."""
    img = Image.open(io.BytesIO(data))
    w, h = img.size
    if (img.format == "JPEG" and target > 0
            and os.environ.get("PROMETHEUS_JPEG_DRAFT", "1") != "0"):
        k = 1
        while k < 8 and min(w, h) // (2 * k) >= target:
            k *= 2
        if k > 1:
            img.draft("RGB", (w // k, h // k))
    arr = np.asarray(img.convert("RGB"))
    return arr, (arr.shape[1] / w, arr.shape[0] / h)


def center_crop_and_resize(img: np.ndarray, size: int,
                           intrinsics: np.ndarray | None = None):
    """Crop the central square and resize to ``size``^2.

    ``intrinsics``: optional ``[fx, fy, cx, cy]`` (pixels) updated in place
    semantics: returns the adjusted copy. Returns ``(img, intrinsics)``.
    """
    h, w = img.shape[:2]
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    img = img[top : top + s, left : left + s]
    pil = Image.fromarray(img).resize((size, size), Image.Resampling.LANCZOS)
    out = np.asarray(pil)
    if intrinsics is not None:
        fx, fy, cx, cy = intrinsics
        scale = size / s
        intrinsics = np.asarray([
            fx * scale, fy * scale,
            (cx - left) * scale, (cy - top) * scale,
        ], np.float32)
    return out, intrinsics


def crop_resize_normalize(img: np.ndarray, size: int,
                          intrinsics: np.ndarray | None = None):
    """Fused per-frame training transform: central-square crop +
    ANTIALIASED resize + float32 CHW [-1, 1] normalize, in ONE pass through
    the native C++ kernel (``prometheus_tpu.native``) when available —
    the data-plane hot path (every training image goes through this).
    Falls back to the PIL LANCZOS + numpy path (≈42 dB agreement on
    textured content; exact on flat regions). Returns ``(chw_f32, intr)``
    with the same intrinsics adjustment as ``center_crop_and_resize``.

    Set ``PROMETHEUS_NATIVE=0`` to force the pure-python path (A/B bench:
    ``tools/bench_loader.py``)."""
    if intrinsics is not None:
        h, w = img.shape[:2]
        intrinsics = _adjust_intrinsics(intrinsics, h, w, size)
    from .. import native

    # native path falls back internally to PIL+numpy when the lib is absent
    return native.center_crop_resize_normalize(img, size), intrinsics


def _adjust_intrinsics(intr, h: int, w: int, size: int) -> np.ndarray:
    """Pixel intrinsics at (h, w) -> after central-square crop + resize."""
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    fx, fy, cx, cy = intr
    scale = size / s
    return np.asarray([fx * scale, fy * scale,
                       (cx - left) * scale, (cy - top) * scale], np.float32)


def decode_crop_resize_normalize(data: bytes, size: int,
                                 intrinsics: np.ndarray | None = None,
                                 normalized: bool = False):
    """The per-frame training hot path in ONE call: image bytes ->
    (DCT-downscaled) decode -> central-square crop -> antialiased resize ->
    float32 CHW [-1, 1], plus the matching intrinsics adjustment.

    JPEG sources route through the fully-native C path (libjpeg decode fused
    into the C++ transform, no intermediate Python image objects); other
    formats (and hosts without libjpeg) use :func:`decode_image_draft` +
    :func:`crop_resize_normalize`. ``PROMETHEUS_JPEG_DRAFT=0`` forces
    full-resolution decodes on both paths; ``PROMETHEUS_NATIVE=0`` forces
    pure Python.

    ``intrinsics``: optional ``[fx, fy, cx, cy]`` — in FULL-resolution
    pixels (``normalized=False``) or resolution-invariant units
    ``[fx/W, fy/H, cx/W, cy/H]`` (``normalized=True``). Returned in target
    (``size``^2) pixel coordinates either way."""
    from .. import native

    max_denom = 1 if os.environ.get("PROMETHEUS_JPEG_DRAFT", "1") == "0" \
        else 8
    out = native.decode_jpeg_crop_resize_normalize(data, size,
                                                   max_denom=max_denom)
    if out is not None:
        chw, (sx, sy), (dh, dw) = out
        if intrinsics is not None:
            fx, fy, cx, cy = np.asarray(intrinsics, np.float32)
            if normalized:
                intr = np.asarray([fx * dw, fy * dh, cx * dw, cy * dh],
                                  np.float32)
            else:
                intr = np.asarray([fx * sx, fy * sy, cx * sx, cy * sy],
                                  np.float32)
            intrinsics = _adjust_intrinsics(intr, dh, dw, size)
        return chw, intrinsics

    raw, (sx, sy) = decode_image_draft(data, size)
    dh, dw = raw.shape[:2]
    if intrinsics is not None:
        fx, fy, cx, cy = np.asarray(intrinsics, np.float32)
        if normalized:
            intrinsics = np.asarray([fx * dw, fy * dh, cx * dw, cy * dh],
                                    np.float32)
        else:
            intrinsics = np.asarray([fx * sx, fy * sy, cx * sx, cy * sy],
                                    np.float32)
    return crop_resize_normalize(raw, size, intrinsics)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 (3, H, W) in [-1, 1] (channels-first)."""
    out = img.astype(np.float32) / 127.5 - 1.0
    return np.moveaxis(out, -1, 0)


def hflip(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1].copy()


def hflip_camera(camera: np.ndarray) -> np.ndarray:
    """Mirror a camera vector for horizontal image flips: negate the x-row
    basis terms of c2w and mirror cx."""
    cam = camera.copy()
    c2w = cam[:12].reshape(3, 4)
    # reflect about the yz-plane of the camera frame: negate first column,
    # and negate x-axis of world offsets consistently via x-row sign flips
    c2w[:, 0] *= -1
    cam[:12] = c2w.reshape(-1)
    cam[14] = cam[17] - cam[14]  # cx' = W - cx
    return cam


def jpeg_compress(img: np.ndarray, quality: int = 75) -> np.ndarray:
    """JPEG round-trip augmentation (uint8 HWC)."""
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


def random_crop_and_resize(img: np.ndarray, size: int, rng,
                           min_scale: float = 0.6,
                           intrinsics: np.ndarray | None = None):
    """Random square crop (scale in [min_scale, 1] of the short side) +
    resize; intrinsics adjusted like :func:`center_crop_and_resize`."""
    h, w = img.shape[:2]
    s = min(h, w)
    crop = int(s * (min_scale + (1.0 - min_scale) * rng.random()))
    top = rng.randrange(max(h - crop, 0) + 1)
    left = rng.randrange(max(w - crop, 0) + 1)
    patch = img[top : top + crop, left : left + crop]
    out = np.asarray(Image.fromarray(patch).resize(
        (size, size), Image.Resampling.LANCZOS))
    if intrinsics is not None:
        fx, fy, cx, cy = intrinsics
        scale = size / crop
        intrinsics = np.asarray([
            fx * scale, fy * scale,
            (cx - left) * scale, (cy - top) * scale], np.float32)
    return out, intrinsics


def adjust_hsv(img: np.ndarray, dh: float = 0.0, ds: float = 0.0,
               dv: float = 0.0) -> np.ndarray:
    """Hue shift (degrees/360), saturation/value scale offsets (uint8 HWC)."""
    hsv = np.asarray(Image.fromarray(img).convert("HSV")).astype(np.int16)
    hsv[..., 0] = (hsv[..., 0] + int(dh * 255)) % 256
    hsv[..., 1] = np.clip(hsv[..., 1] * (1.0 + ds), 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] * (1.0 + dv), 0, 255)
    return np.asarray(
        Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB"))


def gaussian_blur(img: np.ndarray, radius: float = 1.0) -> np.ndarray:
    from PIL import ImageFilter

    return np.asarray(Image.fromarray(img).filter(
        ImageFilter.GaussianBlur(radius)))
