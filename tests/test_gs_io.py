import numpy as np

from prometheus_tpu.utils import export_ply, export_splat, load_ply


def make_gaussians(rng, n=100):
    xyz = rng.normal(size=(1, n, 3)).astype(np.float32)
    feats = rng.uniform(0.1, 0.9, size=(1, n, 1, 3)).astype(np.float32)
    opacity = rng.uniform(0.05, 0.95, size=(1, n, 1)).astype(np.float32)
    scales = rng.uniform(0.01, 0.2, size=(1, n, 3)).astype(np.float32)
    rots = rng.normal(size=(1, n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)
    return xyz, feats, opacity, scales, rots


def test_ply_roundtrip(tmp_path, rng):
    g = make_gaussians(rng)
    path = str(tmp_path / "scene.ply")
    n = export_ply(path, g)
    assert n == 100
    g2 = load_ply(path)
    for a, b, tol in zip(g, g2, [1e-6, 1e-6, 1e-5, 1e-5, 1e-6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol, rtol=1e-4)


def test_ply_opacity_pruning(tmp_path, rng):
    g = list(make_gaussians(rng))
    g[2] = np.where(np.arange(100)[None, :, None] < 30, 0.001, 0.9).astype(np.float32)
    n = export_ply(str(tmp_path / "p.ply"), tuple(g), opacity_threshold=0.01)
    assert n == 70


def test_splat_format(tmp_path, rng):
    g = make_gaussians(rng, n=50)
    path = str(tmp_path / "scene.splat")
    n = export_splat(path, g)
    assert n == 50
    blob = open(path, "rb").read()
    assert len(blob) == 50 * 32  # 32 bytes per record
    rec = np.frombuffer(blob, dtype=[("pos", "<f4", 3), ("scale", "<f4", 3),
                                     ("rgba", "u1", 4), ("quat", "u1", 4)])
    # sorted descending by volume*opacity; positions are a permutation of input
    got = np.sort(rec["pos"].ravel())
    exp = np.sort(np.asarray(g[0]).ravel())
    np.testing.assert_allclose(got, exp, atol=1e-6)
