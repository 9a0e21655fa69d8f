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


def _tile_instances(proj: Projected, tile_size: int, grid_w: int, grid_h: int,
                    max_tiles: tuple[int, int]):
    """Expand gaussians into (tile_id, depth, gaussian_idx) instances.

    ``max_tiles = (ty_cap, tx_cap)``: static per-gaussian cap on covered
    tiles. Gaussians covering more tiles are truncated to the
    ``ty_cap x tx_cap`` window anchored at their bbox top-left (rare for
    pixel-aligned gaussians; raise the cap for scenes with huge splats).
    Returns flat arrays of length N * ty_cap * tx_cap; invalid instances get
    tile_id = grid_w * grid_h (sorted to the end).
    """
    n = proj.mean2d.shape[0]
    ty_cap, tx_cap = max_tiles
    x0 = jnp.clip(jnp.floor((proj.mean2d[:, 0] - proj.radius) / tile_size), 0, grid_w - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((proj.mean2d[:, 0] + proj.radius) / tile_size), 0, grid_w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((proj.mean2d[:, 1] - proj.radius) / tile_size), 0, grid_h - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((proj.mean2d[:, 1] + proj.radius) / tile_size), 0, grid_h - 1).astype(jnp.int32)

    # flat (N*cap,) index math — tiny (N, ty_cap, tx_cap) trailing dims pad
    # terribly onto the (8, 128) TPU vector lanes; one long lane-aligned
    # vector runs ~4x faster at production density
    cap = ty_cap * tx_cap
    rep = lambda a: jnp.repeat(a, cap, total_repeat_length=n * cap)
    dy = jnp.tile(
        jnp.repeat(jnp.arange(ty_cap, dtype=jnp.int32), tx_cap), n)
    dx = jnp.tile(jnp.tile(jnp.arange(tx_cap, dtype=jnp.int32), ty_cap), n)
    ty = rep(y0) + dy
    tx = rep(x0) + dx
    ok = rep(proj.valid) & (ty <= rep(y1)) & (tx <= rep(x1))
    tile_id = jnp.where(ok, ty * grid_w + tx, grid_w * grid_h)
    gauss_idx = rep(jnp.arange(n, dtype=jnp.int32))
    return tile_id, rep(proj.depth), gauss_idx


def tile_overflow_stats(proj: Projected, tile_size: int, grid_w: int,
                        grid_h: int, max_tiles: tuple[int, int]):
    """Diagnostics for the static per-gaussian tile cap: how many valid
    gaussians cover more tiles than ``max_tiles`` keeps (their far instances
    are silently dropped), and the max cover observed. Cheap; run it at
    production density when choosing ``max_tiles``/``tile_capacity``."""
    x0 = jnp.clip(jnp.floor((proj.mean2d[:, 0] - proj.radius) / tile_size), 0, grid_w - 1)
    x1 = jnp.clip(jnp.floor((proj.mean2d[:, 0] + proj.radius) / tile_size), 0, grid_w - 1)
    y0 = jnp.clip(jnp.floor((proj.mean2d[:, 1] - proj.radius) / tile_size), 0, grid_h - 1)
    y1 = jnp.clip(jnp.floor((proj.mean2d[:, 1] + proj.radius) / tile_size), 0, grid_h - 1)
    nx = (x1 - x0 + 1).astype(jnp.int32)
    ny = (y1 - y0 + 1).astype(jnp.int32)
    valid = proj.valid
    over = valid & ((ny > max_tiles[0]) | (nx > max_tiles[1]))
    return {
        "n_valid": jnp.sum(valid.astype(jnp.int32)),
        "n_truncated": jnp.sum(over.astype(jnp.int32)),
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
