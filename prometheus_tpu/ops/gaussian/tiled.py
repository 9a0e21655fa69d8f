"""Tile-based differentiable 3DGS compositing — the production XLA path.

TPU-first redesign of the reference's external CUDA rasterizer (gsplat): the
per-(batch, view) Python loop and dynamic per-tile worklists of the CUDA
implementation become static-shape, fully-vectorized XLA:

1. **Binning**: each projected gaussian is expanded into at most
   ``max_tiles_per_gaussian`` tile-instances (static cap); instances are
   sorted by ``(tile_id, depth)`` with one XLA lexicographic sort.
2. **Segmenting**: per-tile segment starts come from a searchsorted over the
   sorted tile ids; each tile keeps its nearest ``tile_capacity`` instances
   (depth-sorted truncation approximates the CUDA early-termination: dropped
   instances are the farthest, i.e. those behind an already-saturated alpha).
3. **Compositing**: per tile, a scan over fixed-size chunks evaluates
   ``alpha[P, C]`` on the VPU and accumulates RGB/depth via ``(P, C) @ (C, 4)``
   matmuls on the MXU, carrying per-pixel transmittance. Exclusive cumulative
   products of ``(1 - alpha)`` within a chunk give exact front-to-back order.

Everything is ``jax.grad``-compatible: the sort/segment indices are integer
(non-differentiable by construction) while alpha/color/depth accumulation is
smooth in all gaussian parameters.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .naive import ALPHA_CUTOFF, MAX_ALPHA
from .projection import Projected


def _tile_bbox(proj: Projected, tile_size: int, grid_w: int, grid_h: int):
    """Per-gaussian covered-tile bbox ``(x0, x1, y0, y1)`` (inclusive)."""
    x0 = jnp.clip(jnp.floor((proj.mean2d[:, 0] - proj.radius) / tile_size), 0, grid_w - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((proj.mean2d[:, 0] + proj.radius) / tile_size), 0, grid_w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((proj.mean2d[:, 1] - proj.radius) / tile_size), 0, grid_h - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((proj.mean2d[:, 1] + proj.radius) / tile_size), 0, grid_h - 1).astype(jnp.int32)
    return x0, x1, y0, y1


def _expand_window(x0, x1, y0, y1, valid, depth, gauss_idx, window,
                   grid_w, grid_h):
    """Broadcast-expand a ``window=(wy, wx)`` tile neighborhood anchored at
    each gaussian's bbox top-left into flat (tile_id, depth, idx) instances.

    Broadcast (N, wy, wx)-then-flatten is the fast layout: an interleaved
    flat ``jnp.repeat`` was tried and is ~45x SLOWER on v5e at 8.4M
    instances (943 ms vs 21 ms, measured with a real device-fetch sync)
    because each output element becomes a gathered computed-index read,
    while the broadcast form is pure lane-replication.
    """
    wy, wx = window
    dy = jnp.arange(wy, dtype=jnp.int32)
    dx = jnp.arange(wx, dtype=jnp.int32)
    ty = y0[:, None, None] + dy[None, :, None]   # (N, wy, 1)
    tx = x0[:, None, None] + dx[None, None, :]   # (N, 1, wx)
    ok = (
        valid[:, None, None]
        & (ty <= y1[:, None, None])
        & (tx <= x1[:, None, None])
    )
    tile_id = jnp.where(ok, ty * grid_w + tx, grid_w * grid_h).astype(jnp.int32)
    idx = jnp.broadcast_to(gauss_idx[:, None, None], tile_id.shape)
    dep = jnp.broadcast_to(depth[:, None, None], tile_id.shape)
    return tile_id.reshape(-1), dep.reshape(-1), idx.reshape(-1)


def _tile_instances(proj: Projected, tile_size: int, grid_w: int, grid_h: int,
                    max_tiles: tuple[int, int], big_cap: int = 4096):
    """Expand gaussians into (tile_id, depth, gaussian_idx) instances.

    Hierarchical two-level expansion (the static-shape TPU answer to the
    CUDA rasterizer's exact per-gaussian worklists):

    - **small path**: every gaussian gets a 2x2 tile window anchored at its
      bbox top-left. Pixel-aligned gaussians (bbox <= one tile span) are
      covered exactly; this is 4 instances/gaussian instead of a
      ``ty_cap*tx_cap`` blow-up, which dominates the binning sort cost.
    - **big path**: the (rare) gaussians covering more than 2 tiles in
      either dim are selected (one N-length sort) into a ``big_cap`` static
      budget and expanded over the full ``max_tiles`` window; big gaussians
      beyond the budget fall back to their truncated 2x2 window.

    ``max_tiles = (ty_cap, tx_cap)`` is the big-path window. When it is
    <= (2, 2) only the single-level small path runs (window = max_tiles).
    Returns flat arrays of length ``N*4 + big_cap*ty_cap*tx_cap``; invalid
    instances get tile_id = grid_w * grid_h (sorted to the end).
    """
    n = proj.mean2d.shape[0]
    ty_cap, tx_cap = max_tiles
    x0, x1, y0, y1 = _tile_bbox(proj, tile_size, grid_w, grid_h)
    gauss_idx = jnp.arange(n, dtype=jnp.int32)

    if ty_cap <= 2 and tx_cap <= 2:
        return _expand_window(x0, x1, y0, y1, proj.valid, proj.depth,
                              gauss_idx, (ty_cap, tx_cap), grid_w, grid_h)

    big_cap = min(big_cap, n)
    is_big = proj.valid & ((y1 - y0 >= 2) | (x1 - x0 >= 2))

    # big path: compact the big indices with one stable N-length sort (big
    # first, in index order); budget selection = position < big_cap. A tiny
    # big_cap-element scatter marks the selected — no N-length cumsum.
    _, sel_all = jax.lax.sort(
        ((~is_big).astype(jnp.int32), gauss_idx), num_keys=1)
    sel_idx = sel_all[:big_cap]
    sel_ok = jnp.arange(big_cap, dtype=jnp.int32) \
        < jnp.sum(is_big.astype(jnp.int32))
    selected = jnp.zeros((n,), jnp.bool_).at[sel_idx].set(
        sel_ok, mode="drop")

    # small path: everything except the big-selected (budget-overflow big
    # gaussians stay here with a truncated 2x2 window rather than vanishing)
    tid_s, dep_s, idx_s = _expand_window(
        x0, x1, y0, y1, proj.valid & ~selected, proj.depth, gauss_idx,
        (2, 2), grid_w, grid_h)
    tid_b, dep_b, idx_b = _expand_window(
        x0[sel_idx], x1[sel_idx], y0[sel_idx], y1[sel_idx], sel_ok,
        proj.depth[sel_idx], sel_idx, (ty_cap, tx_cap), grid_w, grid_h)

    return (jnp.concatenate([tid_s, tid_b]),
            jnp.concatenate([dep_s, dep_b]),
            jnp.concatenate([idx_s, idx_b]))


def tile_overflow_stats(proj: Projected, tile_size: int, grid_w: int,
                        grid_h: int, max_tiles: tuple[int, int],
                        big_cap: int = 4096):
    """Diagnostics for the hierarchical binning's static caps: how many
    valid gaussians cover more tiles than the big-path ``max_tiles`` window
    keeps (their far instances are dropped), how many big gaussians exceed
    the ``big_cap`` budget (they fall back to a truncated 2x2 window), and
    the max cover observed. Cheap; run it at production density when
    choosing ``max_tiles``/``big_cap``/``tile_capacity``."""
    x0, x1, y0, y1 = _tile_bbox(proj, tile_size, grid_w, grid_h)
    nx = (x1 - x0 + 1).astype(jnp.int32)
    ny = (y1 - y0 + 1).astype(jnp.int32)
    valid = proj.valid
    over = valid & ((ny > max_tiles[0]) | (nx > max_tiles[1]))
    n_big = jnp.sum((valid & ((ny > 2) | (nx > 2))).astype(jnp.int32))
    return {
        "n_valid": jnp.sum(valid.astype(jnp.int32)),
        "n_truncated": jnp.sum(over.astype(jnp.int32)),
        "n_big": n_big,
        "n_big_over_budget": jnp.maximum(n_big - big_cap, 0),
        "max_cover_y": jnp.max(jnp.where(valid, ny, 0)),
        "max_cover_x": jnp.max(jnp.where(valid, nx, 0)),
    }


def sort_tile_instances(tile_id, depth, gauss_idx, n_tiles: int):
    """Order instances by (tile, depth) with ONE single-key u32 sort.

    The fused key packs the tile id into the high bits and a monotone
    quantization of the (positive) depth into the low bits: positive float32
    bit patterns are order-isomorphic to their values, so taking the top
    ``32 - tile_bits`` mantissa/exponent bits preserves depth order up to a
    quantization that only reorders near-equal depths (visually nil; the
    2-key lexicographic sort was ~30% slower at 8.4M instances on v5e).
    Returns ``(sorted_tile, sorted_gauss)``.
    """
    tile_bits = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
    depth_bits = 32 - tile_bits
    db = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 0.0).astype(jnp.float32), jnp.uint32)
    key = (tile_id.astype(jnp.uint32) << jnp.uint32(depth_bits)) \
        | (db >> jnp.uint32(tile_bits))
    sorted_key, sorted_gauss = jax.lax.sort((key, gauss_idx), num_keys=1)
    sorted_tile = (sorted_key >> jnp.uint32(depth_bits)).astype(jnp.int32)
    return sorted_tile, sorted_gauss


@partial(jax.jit, static_argnames=("img_h", "img_w", "tile_size", "tile_capacity",
                                   "max_tiles_y", "max_tiles_x", "chunk"))
def composite_tiled(
    proj: Projected,
    colors: jax.Array,      # (N, 3)
    opacities: jax.Array,   # (N,)
    img_h: int,
    img_w: int,
    tile_size: int = 16,
    tile_capacity: int = 1024,
    max_tiles_y: int = 4,
    max_tiles_x: int = 4,
    chunk: int = 128,
):
    """Render one view. Returns ``(rgb (H,W,3), expected_depth (H,W), alpha (H,W))``.

    ``rgb`` is NOT background-blended (the renderer layer blends).
    """
    assert img_h % tile_size == 0 and img_w % tile_size == 0
    chunk = min(chunk, tile_capacity)
    assert tile_capacity % chunk == 0
    grid_h, grid_w = img_h // tile_size, img_w // tile_size
    n_tiles = grid_h * grid_w

    tile_id, depth_key, gauss_idx = _tile_instances(
        proj, tile_size, grid_w, grid_h, (max_tiles_y, max_tiles_x)
    )
    # (tile, depth) order via one fused-key sort; invalid instances sink to
    # the end (sentinel tile id is the largest).
    sorted_tile, sorted_gauss = sort_tile_instances(
        tile_id, depth_key, gauss_idx, n_tiles)

    # Per-tile segment [start, end) in the sorted instance array.
    tile_range = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_range[:-1], side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_range[:-1], side="right").astype(jnp.int32)
    counts = jnp.minimum(ends - starts, tile_capacity)

    n_inst = sorted_gauss.shape[0]
    # Gather-once: contiguous per-instance packed data in sorted order keeps
    # the inner loop free of random-access gathers.
    sg = sorted_gauss
    packed = jnp.concatenate(
        [
            proj.mean2d[sg],                        # 0:2
            proj.conic[sg],                         # 2:5
            colors[sg],                             # 5:8
            opacities[sg][:, None],                 # 8:9
            jnp.where(jnp.isfinite(proj.depth[sg]), proj.depth[sg], 0.0)[:, None],  # 9:10
        ],
        axis=-1,
    )  # (n_inst, 10)

    p = tile_size * tile_size
    ty_ix = jnp.arange(n_tiles, dtype=jnp.int32) // grid_w
    tx_ix = jnp.arange(n_tiles, dtype=jnp.int32) % grid_w
    yy, xx = jnp.meshgrid(
        jnp.arange(tile_size, dtype=jnp.float32) + 0.5,
        jnp.arange(tile_size, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    # (T, P, 2) pixel centers per tile
    px = jnp.stack(
        [
            xx.reshape(-1)[None, :] + (tx_ix * tile_size).astype(jnp.float32)[:, None],
            yy.reshape(-1)[None, :] + (ty_ix * tile_size).astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )

    n_chunks = tile_capacity // chunk

    def chunk_step(carry, c_ix):
        rgb, dep, trans = carry  # (T,P,3), (T,P), (T,P)
        base = starts + c_ix * chunk                       # (T,)
        offs = jnp.arange(chunk, dtype=jnp.int32)          # (C,)
        idx = base[:, None] + offs[None, :]                # (T, C)
        in_seg = offs[None, :] + c_ix * chunk < counts[:, None]
        idx = jnp.clip(idx, 0, n_inst - 1)
        data = packed[idx]                                 # (T, C, 10)

        d = px[:, :, None, :] - data[:, None, :, 0:2]      # (T, P, C, 2)
        con = data[:, None, :, 2:5]
        sigma = 0.5 * (con[..., 0] * d[..., 0] ** 2 + con[..., 2] * d[..., 1] ** 2) \
            + con[..., 1] * d[..., 0] * d[..., 1]
        alpha = jnp.minimum(MAX_ALPHA, data[:, None, :, 8] * jnp.exp(-sigma))
        alpha = jnp.where(
            in_seg[:, None, :] & (alpha >= ALPHA_CUTOFF) & (sigma >= 0), alpha, 0.0
        )                                                   # (T, P, C)

        one_m = 1.0 - alpha
        # Exclusive cumprod within the chunk -> exact front-to-back order.
        t_in = jnp.concatenate(
            [jnp.ones_like(one_m[..., :1]), jnp.cumprod(one_m[..., :-1], axis=-1)],
            axis=-1,
        )
        w = alpha * t_in * trans[..., None]                 # (T, P, C)
        cd = jnp.concatenate([data[:, :, 5:8], data[:, :, 9:10]], -1)  # (T, C, 4)
        # fp32 accumulation: depth values at bf16 resolution visibly band.
        acc = jnp.einsum("tpc,tcf->tpf", w, cd,
                         precision=jax.lax.Precision.HIGHEST)  # (T, P, 4)
        rgb = rgb + acc[..., :3]
        dep = dep + acc[..., 3]
        trans = trans * t_in[..., -1] * one_m[..., -1]
        return (rgb, dep, trans), None

    init = (
        jnp.zeros((n_tiles, p, 3), jnp.float32),
        jnp.zeros((n_tiles, p), jnp.float32),
        jnp.ones((n_tiles, p), jnp.float32),
    )
    (rgb, dep, trans), _ = jax.lax.scan(
        chunk_step, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )

    alpha_img = 1.0 - trans

    def untile(img):
        c = img.shape[2:]
        return (
            img.reshape(grid_h, grid_w, tile_size, tile_size, *c)
            .swapaxes(1, 2)
            .reshape(img_h, img_w, *c)
        )

    rgb = untile(rgb)
    dep = untile(dep) / jnp.maximum(untile(alpha_img[..., None])[..., 0], 1e-10)
    return rgb, dep, untile(alpha_img[..., None])[..., 0]
