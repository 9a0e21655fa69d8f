"""Official-asset metric paths (VERDICT round-1 missing #7): libsvm SVR
parsing/prediction for BRISQUE, pristine-MVG NIQE from a .mat file, and the
compute_all-style aggregation tool."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from prometheus_tpu.metrics import (
    brisque,
    load_feature_range,
    load_svr_model,
    niqe,
    niqe_features_patches,
    svr_predict,
)

SVR_MODEL = """svm_type epsilon_svr
kernel_type rbf
gamma 0.05
nr_class 2
total_sv 2
rho -1.5
SV
0.7 1:0.5 2:-0.25 3:1.0
-0.3 1:-1.0 2:0.75 3:0.0
"""

RANGE_FILE = """x
-1 1
1 0 10
2 -5 5
3 0 2
"""


def test_svr_parse_and_predict(tmp_path):
    path = os.path.join(tmp_path, "allmodel")
    open(path, "w").write(SVR_MODEL)
    model = load_svr_model(path)
    assert model["sv"].shape == (2, 3)
    x = np.asarray([0.2, 0.1, 0.5])
    # manual RBF-SVR decision value
    k = np.exp(-0.05 * np.sum((model["sv"] - x) ** 2, axis=1))
    want = 0.7 * k[0] - 0.3 * k[1] - (-1.5)
    assert abs(svr_predict(model, x) - want) < 1e-12

    rpath = os.path.join(tmp_path, "allrange")
    open(rpath, "w").write(RANGE_FILE)
    lo, hi = load_feature_range(rpath)
    np.testing.assert_allclose(lo, [0, -5, 0])
    np.testing.assert_allclose(hi, [10, 5, 2])


def test_brisque_with_svr(tmp_path, rng):
    path = os.path.join(tmp_path, "allmodel")
    # a 36-feature model: one SV at zero
    sv = " ".join(f"{i+1}:0.0" for i in range(36))
    open(path, "w").write(
        "svm_type epsilon_svr\nkernel_type rbf\ngamma 0.01\nrho 0.5\nSV\n"
        f"1.0 {sv}\n")
    img = rng.random((64, 64, 3)).astype(np.float32)
    score = brisque(img, svr_params=path)
    assert np.isfinite(score)


def test_niqe_with_official_mat(tmp_path, rng):
    from scipy.io import savemat

    # pristine MVG from a small synthetic population of natural-ish images
    pop = []
    for i in range(4):
        base = rng.random((96, 96)) * 255
        pop.append(niqe_features_patches(base, patch=48))
    pop = np.concatenate(pop, 0)
    mu = pop.mean(0)
    cov = np.cov(pop, rowvar=False) + 1e-3 * np.eye(36)
    mat = os.path.join(tmp_path, "niqe_image_params.mat")
    savemat(mat, {"pop_mu": mu, "pop_cov": cov})

    sharp = rng.random((128, 128)).astype(np.float32)
    flat = np.full((128, 128), 0.5, np.float32)
    s_sharp = niqe(sharp, model_params=mat)
    s_flat = niqe(flat, model_params=mat)
    assert np.isfinite(s_sharp) and np.isfinite(s_flat)
    # a flat image deviates more from the NSS population than noise does
    assert s_flat > s_sharp


def _niqe_reference_reimpl(gray, mat_path, patch=96):
    """Independent re-derivation of the reference NIQE procedure
    (``/root/reference/paper/metric_scripts/compute_niqe.py``) used ONLY to
    cross-check the production implementation: 2-D correlate MSCN with zero
    fill, AGGD-beta features per non-overlapping patch at two scales (cv2
    bicubic half-scale), MVG pseudo-inverse distance. Written vectorized
    where the reference loops, so a transcription slip in either version
    breaks the equality assert."""
    import cv2
    from scipy.io import loadmat
    from scipy.ndimage import correlate1d
    from scipy.special import gamma as G

    grid = np.arange(0.2, 10, 0.001)
    ratio = G(2.0 / grid) ** 2 / (G(1.0 / grid) * G(3.0 / grid))

    def aggd(v):
        v = v.ravel()
        sl = np.sqrt(np.mean(v[v < 0] ** 2)) if (v < 0).any() else 0.0
        sr = np.sqrt(np.mean(v[v >= 0] ** 2)) if (v >= 0).any() else 0.0
        gh = sl / sr if sr else np.inf
        rh = np.mean(np.abs(v)) ** 2 / np.mean(v * v)
        rhn = rh * (gh**3 + 1) * (gh + 1) / (gh**2 + 1) ** 2
        with np.errstate(invalid="ignore"):
            a = grid[np.argmin((ratio - rhn) ** 2)]
        c = np.sqrt(G(1 / a) / G(3 / a))
        bl, br = c * sl, c * sr
        return a, (br - bl) * G(2 / a) / G(1 / a), bl, br

    def mscn(im):
        # separable f32 correlate1d with zero fill — the reference's exact
        # numerics (a full 2-D correlation differs by ~1 ulp, enough to flip
        # the AGGD grid argmin on smooth images)
        x = np.arange(-3, 4, dtype=np.float32)
        k1 = np.exp(-0.5 * x**2 / (7.0 / 6.0) ** 2)   # bit-equal kernel:
        k1 /= k1.sum()   # a 1-ulp kernel diff flips AGGD grid argmin ties
        im = im.astype(np.float32)
        blur = lambda a: correlate1d(correlate1d(a, k1, 0, mode="constant"),
                                     k1, 1, mode="constant")
        mu = blur(im)
        var = blur(im * im)
        return (im - mu) / (np.sqrt(np.abs(var - mu * mu)) + 1.0)

    def feats18(m):
        a, _, bl, br = aggd(m)
        out = [a, (bl + br) / 2.0]
        rolls = [np.roll(m, 1, 1), np.roll(m, 1, 0),
                 np.roll(np.roll(m, 1, 0), 1, 1),
                 np.roll(np.roll(m, 1, 0), -1, 1)]
        for i, s in enumerate(rolls):
            a, n, bl, br = aggd(m * s)
            out += [a, n, bl, bl] if i >= 2 else [a, n, bl, br]
        return out

    h, w = gray.shape
    gray = gray[:h - h % patch, :w - w % patch].astype(np.float32)
    half = cv2.resize(gray, None, fx=0.5, fy=0.5,
                      interpolation=cv2.INTER_CUBIC)
    m1, m2 = mscn(gray), mscn(half)
    rows = []
    for y in range(0, gray.shape[0] - patch + 1, patch):
        for x in range(0, gray.shape[1] - patch + 1, patch):
            rows.append(
                feats18(m1[y:y + patch, x:x + patch])
                + feats18(m2[y // 2:(y + patch) // 2,
                             x // 2:(x + patch) // 2]))
    feats = np.asarray(rows)
    m = loadmat(mat_path)
    d = feats.mean(0) - np.ravel(m["pop_mu"])
    mid = (m["pop_cov"] + np.cov(feats.T)) / 2.0
    return float(np.sqrt(d @ np.linalg.pinv(mid) @ d)), feats


def test_niqe_matches_reference_procedure(tmp_path, rng):
    """Numeric parity of the official-asset NIQE path with the reference
    script's procedure (VERDICT r4 #8): features AND final MVG score agree
    with an independent re-derivation on a fixture .mat + synthetic images,
    so the official ``niqe_image_params.mat`` plugs in with confidence."""
    from scipy.io import savemat

    from prometheus_tpu.metrics import niqe

    # pristine MVG fixture from a synthetic population (both impls would
    # have to share any feature-definition error for this to pass falsely,
    # and they are structured differently)
    pop = np.concatenate([
        niqe_features_patches(rng.random((192, 192)) * 255.0)
        for _ in range(3)], 0)
    assert pop.shape == (3 * 4, 36)
    mat = os.path.join(tmp_path, "niqe_image_params.mat")
    savemat(mat, {"pop_mu": pop.mean(0),
                  "pop_cov": np.cov(pop, rowvar=False) + 1e-3 * np.eye(36)})

    for trial in range(2):
        base = rng.random((200, 224)) * 255.0   # crops to 192x192
        if trial == 1:  # smooth natural-ish image, different NSS regime
            from scipy.ndimage import gaussian_filter

            base = gaussian_filter(base, 3.0) * 2.0
        want, want_feats = _niqe_reference_reimpl(base, mat)
        got_feats = niqe_features_patches(base)
        np.testing.assert_allclose(got_feats, want_feats, rtol=1e-4,
                                   atol=1e-5)
        got = niqe(base, model_params=mat)
        assert abs(got - want) < 1e-3 * max(abs(want), 1.0)


def test_compute_metrics_tool(tmp_path, rng):
    from PIL import Image

    gal = os.path.join(tmp_path, "gallery")
    for prompt in ("a_red_cube", "a_blue_ball"):
        d = os.path.join(gal, prompt)
        os.makedirs(d)
        for v in range(2):
            Image.fromarray(
                (rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
                os.path.join(d, f"view_{v:02d}.png"))
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "compute_metrics.py")
    out = subprocess.run(
        [sys.executable, tool, "--input_dir", gal, "--method", "prometheus"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    metrics = json.load(open(os.path.join(gal, "all_metric.json")))
    assert metrics["metrics_are_proxies"] is True
    assert len(metrics["per_prompt"]) == 2
    assert np.isfinite(metrics["average_niqe"])


def test_compute_metrics_tool_official_assets(tmp_path, rng):
    """End-to-end: the aggregation tool consuming official-format assets
    (libsvm allmodel/allrange + niqe_image_params.mat fixtures)."""
    from PIL import Image
    from scipy.io import savemat

    gal = os.path.join(tmp_path, "gallery")
    d = os.path.join(gal, "a_red_cube")
    os.makedirs(d)
    for v in range(2):
        Image.fromarray(
            (rng.random((96, 96, 3)) * 255).astype(np.uint8)).save(
            os.path.join(d, f"view_{v:02d}.png"))

    svr = os.path.join(tmp_path, "allmodel")
    sv = " ".join(f"{i+1}:0.0" for i in range(36))
    open(svr, "w").write(
        "svm_type epsilon_svr\nkernel_type rbf\ngamma 0.01\nrho 0.5\nSV\n"
        f"1.0 {sv}\n")
    rng_file = os.path.join(tmp_path, "allrange")
    open(rng_file, "w").write(
        "x\n-1 1\n" + "\n".join(f"{i+1} -1 1" for i in range(36)))
    pop = np.concatenate([
        niqe_features_patches(rng.random((96, 96)) * 255, patch=48)
        for _ in range(4)], 0)
    mat = os.path.join(tmp_path, "niqe_image_params.mat")
    savemat(mat, {"pop_mu": pop.mean(0),
                  "pop_cov": np.cov(pop, rowvar=False) + 1e-3 * np.eye(36)})

    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "compute_metrics.py")
    out = subprocess.run(
        [sys.executable, tool, "--input_dir", gal,
         "--brisque_svr", svr, "--brisque_range", rng_file,
         "--niqe_mat", mat],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    metrics = json.load(open(os.path.join(gal, "all_metric.json")))
    assert metrics["metrics_are_proxies"] is False
    assert np.isfinite(metrics["average_niqe"])
    assert np.isfinite(metrics["average_BRISQUE"])
