"""Native (C++) host data-plane kernels with a transparent numpy fallback.

Builds ``prometheus_io.cpp`` into a shared library on first import (cached in
the package dir) and binds it over ctypes. Every entry point has a pure-numpy
fallback so the framework never hard-depends on a working toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "prometheus_io.cpp")
# build into a non-package subdir so pkgutil does not mistake the ctypes
# library for a CPython extension module
_LIB = os.path.join(_DIR, "_build", "libprometheus_io.so")

_lib = None


def _build() -> bool:
    try:
        os.makedirs(os.path.dirname(_LIB), exist_ok=True)
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                "-o", _LIB]
        # prefer the fully-native frame path (libjpeg DCT-downscaled decode
        # fused into the transform); fall back to transform-only if the
        # system lacks libjpeg dev files
        try:
            subprocess.run(base[:2] + ["-DPROMETHEUS_JPEG"] + base[2:]
                           + ["-ljpeg"],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            pass
        subprocess.run(base, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if os.environ.get("PROMETHEUS_NATIVE", "1") == "0":
        return None   # forced pure-python mode (A/B benchmarking, debugging)
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.center_crop_resize_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
    lib.center_crop_resize_normalize.restype = ctypes.c_int
    lib.u8_to_chw_f32.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
    lib.u8_to_chw_f32.restype = ctypes.c_int
    lib.encode_splat.argtypes = [f32p, f32p, f32p, f32p, f32p,
                                 ctypes.c_int, ctypes.c_float, u8p]
    lib.encode_splat.restype = ctypes.c_int
    if hasattr(lib, "decode_jpeg_crop_resize_normalize"):
        lib.decode_jpeg_crop_resize_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
            ctypes.POINTER(ctypes.c_int)]
        lib.decode_jpeg_crop_resize_normalize.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def center_crop_resize_normalize(img: np.ndarray, out_size: int) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 (3, out, out) in [-1, 1] (native or numpy)."""
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    if lib is not None:
        dst = np.empty((3, out_size, out_size), np.float32)
        rc = lib.center_crop_resize_normalize(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            out_size, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == 0:
            return dst
    # numpy fallback (PIL resize, matches transforms.py semantics)
    from ..datasets.transforms import center_crop_and_resize, normalize_image

    out, _ = center_crop_and_resize(img, out_size)
    return normalize_image(out)


def decode_jpeg_crop_resize_normalize(data: bytes, out_size: int,
                                      max_denom: int = 8):
    """JPEG bytes -> ``(chw_f32 (3, S, S) in [-1, 1], (sx, sy), (dec_h,
    dec_w))`` in ONE native call (libjpeg DCT-downscaled decode fused into
    the crop/antialiased-resize/normalize transform). ``(sx, sy)`` =
    decoded/full per-axis scale for intrinsics rescale; ``max_denom=1``
    forces a full-resolution decode.

    Returns ``None`` when the native path is unavailable or declines the
    file (non-JPEG, corrupt, exotic colorspace) — callers fall back to the
    Python decoder."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "decode_jpeg_crop_resize_normalize"):
        return None
    buf = np.frombuffer(data, np.uint8)
    dst = np.empty((3, out_size, out_size), np.float32)
    dims = np.zeros(4, np.int32)
    rc = lib.decode_jpeg_crop_resize_normalize(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out_size, max_denom,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        return None
    return (dst, (float(dims[2]) / dims[0], float(dims[3]) / dims[1]),
            (int(dims[3]), int(dims[2])))


def encode_splat(gaussians, opacity_threshold: float = 0.0) -> bytes:
    """Gaussian tuple -> packed .splat bytes (native sort+quantize)."""
    xyz, feats, opacity, scales, rots = (
        np.ascontiguousarray(np.asarray(a, np.float32)) for a in gaussians)
    if xyz.ndim == 3:
        xyz, feats, opacity, scales, rots = (
            a[0] for a in (xyz, feats, opacity, scales, rots))
    n = xyz.shape[0]
    rgb = np.ascontiguousarray(feats.reshape(n, -1)[:, :3])
    op = np.ascontiguousarray(opacity.reshape(n))
    lib = get_lib()
    if lib is not None:
        out = np.empty(32 * n, np.uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        cnt = lib.encode_splat(
            xyz.ctypes.data_as(f32p), rgb.ctypes.data_as(f32p),
            op.ctypes.data_as(f32p),
            np.ascontiguousarray(scales).ctypes.data_as(f32p),
            np.ascontiguousarray(rots).ctypes.data_as(f32p),
            n, opacity_threshold,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out[: 32 * cnt].tobytes()
    # numpy fallback via the python exporter
    import io as _io
    import tempfile

    from ..utils.gs_io import export_splat

    with tempfile.NamedTemporaryFile(suffix=".splat") as tmp:
        export_splat(tmp.name, (xyz[None], feats[None].reshape(1, n, 1, 3),
                                opacity.reshape(1, n, 1), scales[None],
                                rots[None]), opacity_threshold)
        tmp.seek(0)
        return open(tmp.name, "rb").read()
