import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.ops.gaussian import (
    composite_naive,
    composite_tiled,
    covariance_3d,
    project_gaussians,
    render_gaussians,
)
from prometheus_tpu.utils import make_camera


def make_scene(rng, n=200, spread=1.0, scale=0.05):
    """Random gaussians in front of an identity OpenCV camera (z forward)."""
    xyz = np.concatenate(
        [
            rng.uniform(-spread, spread, size=(n, 2)),
            rng.uniform(2.0, 6.0, size=(n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    scales = rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32) * scale
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, size=(n,)).astype(np.float32)
    return map(jnp.asarray, (xyz, scales, quats, colors, opac))


def identity_w2c():
    return jnp.eye(4)


def project_scene(rng, h=64, w=64, f=60.0, **kw):
    xyz, scales, quats, colors, opac = make_scene(rng, **kw)
    proj = project_gaussians(
        xyz, scales, quats, identity_w2c(), f, f, w / 2, h / 2, h, w
    )
    return proj, colors, opac


def test_covariance_3d_identity_quat():
    s = jnp.asarray([[0.1, 0.2, 0.3]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    cov = np.asarray(covariance_3d(s, q))[0]
    np.testing.assert_allclose(cov, np.diag([0.01, 0.04, 0.09]), atol=1e-7)


def test_projection_center_gaussian():
    # gaussian at (0,0,4) with identity camera, f=60, c=(32,32)
    proj = project_gaussians(
        jnp.asarray([[0.0, 0.0, 4.0]]),
        jnp.asarray([[0.1, 0.1, 0.1]]),
        jnp.asarray([[1.0, 0.0, 0.0, 0.0]]),
        identity_w2c(), 60.0, 60.0, 32.0, 32.0, 64, 64,
    )
    assert bool(proj.valid[0])
    np.testing.assert_allclose(np.asarray(proj.mean2d[0]), [32.0, 32.0], atol=1e-5)
    np.testing.assert_allclose(float(proj.depth[0]), 4.0, atol=1e-6)
    # isotropic gaussian: cov2d = (f*s/z)^2 + eps2d = 2.25 + 0.3; conic = 1/2.55
    np.testing.assert_allclose(
        np.asarray(proj.conic[0]), [1 / 2.55, 0.0, 1 / 2.55], atol=1e-4
    )


def test_projection_culls_behind_camera():
    proj = project_gaussians(
        jnp.asarray([[0.0, 0.0, -4.0], [0.0, 0.0, 4.0]]),
        jnp.full((2, 3), 0.1),
        jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
        identity_w2c(), 60.0, 60.0, 32.0, 32.0, 64, 64,
    )
    assert not bool(proj.valid[0]) and bool(proj.valid[1])
    assert float(proj.radius[0]) == 0.0


def test_projection_culls_offscreen():
    proj = project_gaussians(
        jnp.asarray([[100.0, 0.0, 4.0]]),
        jnp.full((1, 3), 0.01),
        jnp.asarray([[1.0, 0, 0, 0]]),
        identity_w2c(), 60.0, 60.0, 32.0, 32.0, 64, 64,
    )
    assert not bool(proj.valid[0])


def test_tiled_matches_naive(rng):
    h = w = 64
    proj, colors, opac = project_scene(rng, h=h, w=w, n=300)
    rgb_n, dep_n, a_n = composite_naive(proj, colors, opac, h, w, tile_size=16)
    rgb_t, dep_t, a_t = composite_tiled(
        proj, colors, opac, h, w, tile_size=16, tile_capacity=512, chunk=64,
        max_tiles_y=8, max_tiles_x=8,
    )
    np.testing.assert_allclose(np.asarray(rgb_t), np.asarray(rgb_n), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_n), atol=2e-5)
    # expected depth only meaningful where alpha is non-negligible
    m = np.asarray(a_n) > 1e-3
    np.testing.assert_allclose(
        np.asarray(dep_t)[m], np.asarray(dep_n)[m], atol=1e-3, rtol=1e-4
    )


def test_tiled_matches_naive_big_splats(rng):
    # larger splats exercise multi-tile binning
    h = w = 64
    proj, colors, opac = project_scene(rng, h=h, w=w, n=50, scale=0.3)
    rgb_n, _, a_n = composite_naive(proj, colors, opac, h, w, tile_size=16)
    rgb_t, _, a_t = composite_tiled(
        proj, colors, opac, h, w, tile_size=16, tile_capacity=64, chunk=32,
        max_tiles_y=8, max_tiles_x=8,
    )
    np.testing.assert_allclose(np.asarray(rgb_t), np.asarray(rgb_n), atol=2e-5)


def test_tiled_capacity_truncation_is_depth_ordered(rng):
    # with tiny capacity the image should still be dominated by near gaussians:
    # truncation drops the farthest instances only.
    h = w = 32
    xyz = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 8.0]])
    scales = jnp.full((2, 3), 0.5)
    quats = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    colors = jnp.asarray([[1.0, 0, 0], [0.0, 1.0, 0]])
    opac = jnp.asarray([0.99, 0.99])
    proj = project_gaussians(xyz, scales, quats, identity_w2c(), 30.0, 30.0, 16.0, 16.0, h, w)
    rgb, _, _ = composite_tiled(
        proj, colors, opac, h, w, tile_size=16, tile_capacity=1, chunk=1,
        max_tiles_y=4, max_tiles_x=4,
    )
    center = np.asarray(rgb)[16, 16]
    assert center[0] > 0.9 and center[1] < 0.05  # near (red) kept, far dropped


def test_gradients_flow_and_are_finite(rng):
    h = w = 32
    xyz, scales, quats, colors, opac = make_scene(rng, n=50)

    def loss_fn(xyz, scales, quats, colors, opac):
        proj = project_gaussians(
            xyz, scales, quats, identity_w2c(), 30.0, 30.0, w / 2, h / 2, h, w
        )
        rgb, dep, a = composite_tiled(
            proj, colors, opac, h, w, tile_size=16, tile_capacity=256, chunk=64
        )
        return jnp.sum(rgb**2) + jnp.sum(a)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(xyz, scales, quats, colors, opac)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
    # color gradient must be nonzero (visible gaussians contribute)
    assert float(jnp.abs(grads[3]).max()) > 0


def test_gradient_matches_finite_difference(rng):
    # check d loss / d opacity on a tiny scene against central differences
    h = w = 16
    xyz = jnp.asarray([[0.0, 0.0, 3.0]])
    scales = jnp.full((1, 3), 0.3)
    quats = jnp.asarray([[1.0, 0, 0, 0]])
    colors = jnp.asarray([[0.8, 0.2, 0.4]])

    def loss(op):
        proj = project_gaussians(xyz, scales, quats, identity_w2c(), 15.0, 15.0, 8.0, 8.0, h, w)
        rgb, _, _ = composite_tiled(
            proj, colors, op, h, w, tile_size=16, tile_capacity=16, chunk=16,
        )
        return jnp.sum(rgb**2)

    op0 = jnp.asarray([0.6])
    g = jax.grad(loss)(op0)
    eps = 1e-3
    fd = (loss(op0 + eps) - loss(op0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=2e-2)


def test_render_gaussians_batched(rng):
    B, N, P = 2, 3, 128
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(B, P, 3)), jnp.float32)
    xyz = xyz.at[..., 2].add(-3.0)  # in front of cameras looking down -z
    feats = jnp.asarray(rng.uniform(0, 1, size=(B, P, 1, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 1, size=(B, P, 1)), jnp.float32)
    scales = jnp.full((B, P, 3), 0.05)
    rots = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, P, 1))
    cam = make_camera(jnp.eye(3, 4), 60.0, 60.0, 32.0, 32.0, 64.0, 64.0)
    cams = jnp.tile(cam, (B, N, 1))
    imgs, deps, masks = render_gaussians(
        cams, (xyz, feats, opac, scales, rots), h=64, w=64, tile_capacity=256
    )
    assert imgs.shape == (B, N, 3, 64, 64)
    assert deps.shape == (B, N, 1, 64, 64)
    assert masks.shape == (B, N, 1, 64, 64)
    assert bool(jnp.isfinite(imgs).all())
    # identical views -> identical renders
    np.testing.assert_allclose(np.asarray(imgs[:, 0]), np.asarray(imgs[:, 1]), atol=1e-6)
    # background is white where alpha ~ 0 -> image ~ +1
    m = np.asarray(masks[0, 0, 0]) < 1e-4
    if m.any():
        np.testing.assert_allclose(np.asarray(imgs[0, 0, :, m]).min(), 1.0, atol=1e-3)


def test_empty_scene_renders_background():
    cam = make_camera(jnp.eye(3, 4), 60.0, 60.0, 16.0, 16.0, 32.0, 32.0)[None, None]
    P = 8
    gauss = (
        jnp.zeros((1, P, 3)).at[..., 2].set(100.0),  # far behind everything? no: +z is behind OpenGL cam
        jnp.full((1, P, 1, 3), 0.5),
        jnp.zeros((1, P, 1)),                          # zero opacity anyway
        jnp.full((1, P, 3), 0.01),
        jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, P, 1)),
    )
    imgs, deps, masks = render_gaussians(cam, gauss, h=32, w=32, tile_capacity=16)
    np.testing.assert_allclose(np.asarray(masks), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(imgs), 1.0, atol=1e-6)  # white bg in [-1,1]


def test_exact_pixels_matches_naive(rng):
    """composite_exact_pixels (chunked scan) == composite_naive (dense) at
    every pixel of a small frame."""
    from prometheus_tpu.ops.gaussian.naive import (composite_exact_pixels,
                                                   composite_naive)

    proj, colors, opac = project_scene(rng, n=300)
    rgb_n, dep_n, a_n = composite_naive(proj, colors, opac, 64, 64)
    ys, xs = jnp.meshgrid(jnp.arange(64, dtype=jnp.float32) + 0.5,
                          jnp.arange(64, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    px = jnp.stack([xs, ys], -1).reshape(-1, 2)
    rgb_e, dep_e, a_e = composite_exact_pixels(proj, colors, opac, px,
                                               chunk=128)
    np.testing.assert_allclose(np.asarray(rgb_e).reshape(64, 64, 3),
                               np.asarray(rgb_n), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_e).reshape(64, 64),
                               np.asarray(a_n), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep_e).reshape(64, 64),
                               np.asarray(dep_n), atol=2e-4)


def test_psnr_vs_exact_small_scene(rng):
    """The production path at ample capacity should sit near the exact
    compositor (>= 40 dB) on a random scene; the trained-statistics scene
    generator produces a renderable, mostly-small-splat population."""
    from prometheus_tpu.ops.gaussian.quality import (make_trained_stats_scene,
                                                     psnr_vs_exact)
    from prometheus_tpu.utils import get_random_cameras

    key = jax.random.PRNGKey(0)
    cams = get_random_cameras(key, 2, size=64)[None]
    gaussians = make_trained_stats_scene(key, cams, n_gaussians=4096)
    db = psnr_vs_exact(cams[0, 0], tuple(g[0] for g in gaussians),
                       jax.random.PRNGKey(1), h=64, w=64,
                       tile_capacity=1024, n_sample_tiles=8, chunk=512)
    assert float(db) >= 40.0, float(db)


def test_rect_min_sigma_matches_bruteforce(rng):
    """_rect_min_sigma (closed-form edge minimization) vs a dense grid min
    over random PSD conics and random rects."""
    from prometheus_tpu.ops.gaussian.tiled import _rect_min_sigma

    n = 64
    # random PSD conic: a, c > 0, b^2 < a*c
    a = rng.uniform(0.01, 2.0, n).astype(np.float32)
    c = rng.uniform(0.01, 2.0, n).astype(np.float32)
    b = (rng.uniform(-0.95, 0.95, n) * np.sqrt(a * c)).astype(np.float32)
    mx = rng.uniform(-20, 20, n).astype(np.float32)
    my = rng.uniform(-20, 20, n).astype(np.float32)
    x0 = rng.uniform(-16, 16, n).astype(np.float32)
    y0 = rng.uniform(-16, 16, n).astype(np.float32)
    x1, y1 = x0 + 16.0, y0 + 16.0

    got = np.asarray(_rect_min_sigma(
        jnp.asarray(mx), jnp.asarray(my), jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(c), jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(x1),
        jnp.asarray(y1)))

    t = np.linspace(0.0, 1.0, 201, dtype=np.float32)
    gx = x0[:, None] + t[None, :] * 16.0                     # (n, S)
    gy = y0[:, None] + t[None, :] * 16.0
    dx = gx[:, :, None] - mx[:, None, None]                  # (n, S, 1)
    dy = gy[:, None, :] - my[:, None, None]                  # (n, 1, S) via bcast
    sig = (0.5 * (a[:, None, None] * dx ** 2 + c[:, None, None] * dy ** 2)
           + b[:, None, None] * dx * dy)
    brute = sig.reshape(n, -1).min(axis=1)
    # closed-form is a true min over the continuous rect: <= grid min, and
    # equal up to grid resolution
    assert (got <= brute + 1e-4).all()
    np.testing.assert_allclose(got, brute, atol=5e-2)


def test_per_axis_extents_tighter_and_exact(rng):
    """Anisotropic splats: per-axis rx/ry are tighter than the isotropic
    radius, and the tiled render with the tighter binning still equals the
    naive compositor (per-tile culled instances contribute exactly zero)."""
    h = w = 64
    n = 80
    xyz = np.concatenate([rng.uniform(-1, 1, size=(n, 2)),
                          rng.uniform(2.0, 6.0, size=(n, 1))],
                         axis=1).astype(np.float32)
    # strongly anisotropic: one long axis, two short
    scales = np.stack([rng.uniform(0.3, 0.6, n), np.full(n, 0.02),
                       np.full(n, 0.02)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = jnp.asarray(rng.uniform(0, 1, size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 1.0, size=(n,)).astype(np.float32))
    proj = project_gaussians(jnp.asarray(xyz), jnp.asarray(scales),
                             jnp.asarray(quats), identity_w2c(),
                             60.0, 60.0, w / 2, h / 2, h, w, opacities=opac)
    rx, ry, rad = map(np.asarray, (proj.rx, proj.ry, proj.radius))
    v = np.asarray(proj.valid)
    assert (rx[v] <= rad[v] + 1e-4).all() and (ry[v] <= rad[v] + 1e-4).all()
    # anisotropy means at least one axis is much tighter for most splats
    assert (np.minimum(rx[v], ry[v]) < 0.8 * rad[v]).mean() > 0.5

    rgb_n, _, a_n = composite_naive(proj, colors, opac, h, w, tile_size=16)
    rgb_t, _, a_t = composite_tiled(proj, colors, opac, h, w, tile_size=16,
                                    tile_capacity=256, chunk=64,
                                    max_tiles_y=8, max_tiles_x=8)
    np.testing.assert_allclose(np.asarray(rgb_t), np.asarray(rgb_n), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_n), atol=2e-5)


def test_per_tile_cull_drops_dead_instances(rng):
    """The exact per-tile cull removes bbox-corner instances whose tile the
    cutoff ellipse misses — live instance count < bbox cover — without
    changing the render (cross-checked against naive above)."""
    from prometheus_tpu.ops.gaussian.tiled import (_tile_instances,
                                                   tile_overflow_stats)

    h = w = 64
    # opacity-aware projection so the cull has per-gaussian cutoff levels
    xyz, scales, quats, colors, opac = make_scene(rng, n=50, scale=0.3)
    proj = project_gaussians(xyz, scales, quats, identity_w2c(), 60.0, 60.0,
                             w / 2, h / 2, h, w, opacities=opac)
    gw = gh = w // 16
    stats = tile_overflow_stats(proj, 16, gw, gh, (8, 8))
    cover = int(stats["instances_needed"])
    tile_id, _, _ = _tile_instances(proj, 16, gw, gh, (8, 8),
                                    s_max=max(2 * cover, 64), opacities=opac)
    live = int((np.asarray(tile_id) != gw * gh).sum())
    assert live < cover, (live, cover)
    assert live > 0
