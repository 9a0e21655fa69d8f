"""Native C++ data-plane kernels vs their numpy/python references."""
import numpy as np
import pytest

from prometheus_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of prometheus_io failed"


def test_crop_resize_normalize_matches_reference(rng):
    # smooth gradient image: bilinear (native) vs lanczos (PIL) agree closely
    # away from high-frequency content
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([yy * 4, xx * 3, (yy + xx) * 2], -1).astype(np.uint8)
    out = native.center_crop_resize_normalize(img, 32)
    assert out.shape == (3, 32, 32)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    from prometheus_tpu.datasets.transforms import (
        center_crop_and_resize, normalize_image)

    ref, _ = center_crop_and_resize(img, 32)
    ref = normalize_image(ref)
    assert np.abs(out - ref).mean() < 0.02


def test_crop_resize_identity_on_flat():
    img = np.full((40, 40, 3), 200, np.uint8)
    out = native.center_crop_resize_normalize(img, 16)
    np.testing.assert_allclose(out, 200 / 127.5 - 1.0, atol=1e-5)


def test_encode_splat_matches_python(rng):
    n = 50
    xyz = rng.normal(size=(1, n, 3)).astype(np.float32)
    feats = rng.uniform(0.1, 0.9, size=(1, n, 1, 3)).astype(np.float32)
    op = rng.uniform(0.05, 0.95, size=(1, n, 1)).astype(np.float32)
    scales = rng.uniform(0.01, 0.2, size=(1, n, 3)).astype(np.float32)
    rots = rng.normal(size=(1, n, 4)).astype(np.float32)
    g = (xyz, feats, op, scales, rots)

    blob = native.encode_splat(g)
    assert len(blob) == 32 * n
    rec = np.frombuffer(blob, dtype=[("pos", "<f4", 3), ("scale", "<f4", 3),
                                     ("rgba", "u1", 4), ("quat", "u1", 4)])
    # same record set as the python exporter (order: volume*opacity desc)
    import tempfile

    from prometheus_tpu.utils.gs_io import export_splat

    with tempfile.NamedTemporaryFile(suffix=".splat") as tmp:
        export_splat(tmp.name, g)
        ref = np.fromfile(tmp.name, dtype=rec.dtype)
    np.testing.assert_allclose(np.sort(rec["pos"].ravel()),
                               np.sort(ref["pos"].ravel()), atol=1e-6)
    # first record is the biggest splat in both
    np.testing.assert_allclose(rec["pos"][0], ref["pos"][0], atol=1e-6)


def test_encode_splat_pruning(rng):
    n = 10
    g = (rng.normal(size=(1, n, 3)).astype(np.float32),
         np.full((1, n, 1, 3), 0.5, np.float32),
         np.linspace(0, 1, n, dtype=np.float32).reshape(1, n, 1),
         np.full((1, n, 3), 0.1, np.float32),
         np.tile(np.asarray([1, 0, 0, 0], np.float32), (1, n, 1)))
    blob = native.encode_splat(g, opacity_threshold=0.5)
    assert len(blob) // 32 == 5
