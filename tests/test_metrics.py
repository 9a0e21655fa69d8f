import numpy as np
import pytest

from prometheus_tpu.metrics import brisque, brisque_features, clip_score, mscn, niqe, psnr, ssim


def test_psnr():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-6)
    assert psnr(a, a) > 100


def test_ssim_identity_and_noise(rng):
    img = rng.uniform(size=(32, 32)).astype(np.float64)
    assert ssim(img, img) > 0.999
    noisy = np.clip(img + 0.3 * rng.normal(size=img.shape), 0, 1)
    assert ssim(img, noisy) < 0.9
    # channels supported
    img3 = rng.uniform(size=(32, 32, 3))
    assert ssim(img3, img3) > 0.999


def test_mscn_statistics(rng):
    img = rng.normal(0.5, 0.2, size=(64, 64))
    m = mscn(img)
    assert abs(float(m.mean())) < 0.1
    assert m.shape == img.shape


def test_brisque_features_shape(rng):
    img = rng.uniform(size=(64, 64, 3))
    f = brisque_features(img)
    assert f.shape == (36,)
    assert np.isfinite(f).all()


def test_brisque_prefers_natural_statistics(rng):
    # a 1/f-spectrum image (natural scene statistics) must score lower
    # (better) than its blurred version and than a flat image
    from numpy.fft import fft2, ifft2

    base = rng.normal(size=(128, 128))
    fy = np.fft.fftfreq(128)[:, None]
    fx = np.fft.fftfreq(128)[None, :]
    spec = fft2(base) / (np.sqrt(fx**2 + fy**2) + 0.02)
    nat = np.real(ifft2(spec))
    nat = (nat - nat.min()) / (nat.max() - nat.min())
    blur = nat.copy()
    for _ in range(8):
        blur = 0.25 * (np.roll(blur, 1, 0) + np.roll(blur, -1, 0)
                       + np.roll(blur, 1, 1) + np.roll(blur, -1, 1))
    flat = np.full((128, 128), 0.5) + 1e-3 * rng.normal(size=(128, 128))
    assert brisque(nat) < brisque(blur) < brisque(flat)


def test_niqe_finite(rng):
    img = rng.uniform(size=(96, 96))
    v = niqe(img)
    assert np.isfinite(v) and v >= 0


def test_clip_score():
    a = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert clip_score(a, a) == pytest.approx(1.0)
    assert clip_score(a, a[::-1]) == pytest.approx(0.0)
