"""Tile-based differentiable 3DGS compositing — the production XLA path.

TPU-first redesign of the reference's external CUDA rasterizer (gsplat): the
per-(batch, view) Python loop and dynamic per-tile worklists of the CUDA
implementation become static-shape, fully-vectorized XLA:

1. **Binning**: exact compact expansion — each projected gaussian owns a
   contiguous slot range (exclusive cumsum of its covered-tile count,
   clamped to a centered ``max_tiles`` window) inside a static ``s_max``
   instance budget, decoded slot->gaussian with a scatter + cumulative max;
   instances are sorted by ``(tile_id, depth)`` with one fused-key u32 sort.
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

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .naive import ALPHA_CUTOFF, MAX_ALPHA
from .projection import Projected, bbox_extents


def _tile_bbox(proj: Projected, tile_size: int, grid_w: int, grid_h: int):
    """Per-gaussian covered-tile bbox ``(x0, x1, y0, y1)`` (inclusive).

    Uses the per-axis cutoff extents (``rx``/``ry``) when the projection
    provides them — the EXACT AABB of the alpha-cutoff level set, tighter
    than the isotropic eigenvalue radius for anisotropic splats, so every
    culled tile provably receives zero contribution."""
    rx, ry = bbox_extents(proj)
    x0 = jnp.clip(jnp.floor((proj.mean2d[:, 0] - rx) / tile_size), 0, grid_w - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((proj.mean2d[:, 0] + rx) / tile_size), 0, grid_w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((proj.mean2d[:, 1] - ry) / tile_size), 0, grid_h - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((proj.mean2d[:, 1] + ry) / tile_size), 0, grid_h - 1).astype(jnp.int32)
    return x0, x1, y0, y1


def _clamped_windows(proj: Projected, tile_size: int, grid_w: int,
                     grid_h: int, max_tiles: tuple[int, int]):
    """Per-gaussian covered-tile windows, clamped to ``max_tiles`` CENTERED
    on the splat mean (the brightest region survives a clamp, not the bbox's
    top-left corner). Returns ``(ex0, ey0, wx, wy)``; window = exact bbox
    whenever it fits inside ``max_tiles``."""
    wy_cap, wx_cap = max_tiles
    x0, x1, y0, y1 = _tile_bbox(proj, tile_size, grid_w, grid_h)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    wx = jnp.minimum(nx, wx_cap)
    wy = jnp.minimum(ny, wy_cap)
    cxt = jnp.clip(jnp.floor(proj.mean2d[:, 0] / tile_size), 0,
                   grid_w - 1).astype(jnp.int32)
    cyt = jnp.clip(jnp.floor(proj.mean2d[:, 1] / tile_size), 0,
                   grid_h - 1).astype(jnp.int32)
    ex0 = jnp.clip(cxt - wx // 2, x0, x1 - wx + 1)
    ey0 = jnp.clip(cyt - wy // 2, y0, y1 - wy + 1)
    return ex0, ey0, wx, wy


def _rect_min_sigma(mx, my, ca, cb, cc, x0, y0, x1, y1):
    """Minimum of ``sigma(d) = 0.5*(ca dx^2 + cc dy^2) + cb dx dy`` over the
    rectangle ``[x0, x1] x [y0, y1]`` (pixel coords), d = p - mean.

    The quadratic is PSD (conic = inverse covariance), so the minimum is 0
    when the mean lies inside the rect, else it lies on the boundary: each
    edge is a 1-D quadratic minimized in closed form and clamped to the
    edge's extent. Used for EXACT per-tile culling — an instance whose
    minimum sigma over its tile exceeds the alpha-cutoff level contributes
    exactly nothing (every compositor zeroes alpha < ALPHA_CUTOFF)."""
    lx, ux = x0 - mx, x1 - mx
    ly, uy = y0 - my, y1 - my

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)
    # vertical edges x = lx / ux: optimal y* = -cb x / cc, clamped
    y_l = jnp.clip(-cb * lx / cc_s, ly, uy)
    y_u = jnp.clip(-cb * ux / cc_s, ly, uy)
    # horizontal edges y = ly / uy: optimal x* = -cb y / ca, clamped
    x_l = jnp.clip(-cb * ly / ca_s, lx, ux)
    x_u = jnp.clip(-cb * uy / ca_s, lx, ux)
    edge_min = jnp.minimum(
        jnp.minimum(q(lx, y_l), q(ux, y_u)),
        jnp.minimum(q(x_l, ly), q(x_u, uy)))
    inside = (lx <= 0) & (ux >= 0) & (ly <= 0) & (uy >= 0)
    return jnp.where(inside, 0.0, edge_min)


# Forward-scatter tier plan: ``(k_hi, B)`` — candidate window-tile indices
# ``[k_lo, k_hi)`` are emitted for the ``B`` largest-window gaussians (None =
# all). Sized from the trained-statistics scene at 512^2/524k (area>16:
# 9.8k, >128: 4.7k, >512: 360 gaussians; max 1024 at the (32,32) clamp) with
# ~2x headroom; a scene with more big splats than a tier's B drops those
# splats' outer tiles only (the same graceful budget-cut semantics as
# ``s_max``; ``tile_overflow_stats`` reports violations).
_FSCATTER_TIERS: tuple[tuple[int, int | None], ...] = (
    (16, None), (128, 16384), (512, 8192), (1024, 1024))


def _tile_instances_fscatter(proj: Projected, tile_size: int, grid_w: int,
                             grid_h: int, max_tiles: tuple[int, int],
                             s_max: int,
                             opacities: jax.Array | None = None):
    """Forward-scatter expansion — same slot layout as ``_tile_instances``
    (descending-opacity ranges from an area cumsum), built WITHOUT the
    O(s_max) slot->gaussian decode: each live (gaussian, window-tile)
    candidate scatters its ``(tile_id, depth, gauss)`` payload directly into
    its slot. The exact per-tile cull runs per CANDIDATE (N x 16 + a few
    B x K tiers for big splats) instead of per SLOT (s_max = 6N), and the
    (s_max, 12) decode gather disappears; dead slots keep the buffer's
    sentinel and sort to the end. Per-slot output is identical to the
    scan-decode modes on ``tile_id`` everywhere and on ``(depth, gauss)``
    at every live slot (sentinel slots carry junk there, as they do in the
    scan modes; the compositors never read them)."""
    n = proj.mean2d.shape[0]
    assert s_max < (1 << 24) - (1 << 11) and n < (1 << 24), (
        f"instance budget {s_max} / N {n} exceed f32-exact integer range")
    ex0, ey0, wx, wy = _clamped_windows(proj, tile_size, grid_w, grid_h,
                                        max_tiles)
    cover = jnp.where(proj.valid, wx * wy, 0).astype(jnp.int32)

    if opacities is None:
        order = jnp.arange(n, dtype=jnp.int32)
    else:
        op = jax.lax.stop_gradient(opacities).astype(jnp.float32)
        _, order = jax.lax.sort((-jnp.where(jnp.isfinite(op), op, 0.0),
                                 jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    cover_o = cover[order]
    ends = jnp.cumsum(cover_o.astype(jnp.float32))   # f32: exact < 2^24
    starts = ends - cover_o.astype(jnp.float32)

    # per-position packed columns (opacity-ordered layout)
    cols = [
        starts,
        ex0[order].astype(jnp.float32),
        ey0[order].astype(jnp.float32),
        jnp.maximum(wx[order], 1).astype(jnp.float32),
        cover_o.astype(jnp.float32),
        jnp.where(jnp.isfinite(proj.depth[order]), proj.depth[order], 0.0),
        order.astype(jnp.float32),
    ]
    if opacities is not None:
        mean_o = jax.lax.stop_gradient(proj.mean2d)[order]
        conic_o = jax.lax.stop_gradient(proj.conic)[order]
        op_o = jax.lax.stop_gradient(opacities)[order].astype(jnp.float32)
        q_cut = jnp.log(jnp.maximum(op_o, 1e-12) / ALPHA_CUTOFF)
        cols += [mean_o[:, 0], mean_o[:, 1], conic_o[:, 0], conic_o[:, 1],
                 conic_o[:, 2], q_cut]
    packed = jnp.stack(cols, axis=1)                 # (N, 7 or 13)

    # big-splat tier selection: positions ordered by descending window area
    _, area_order = jax.lax.sort(
        (-cover_o.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)),
        num_keys=1)

    k_cap = max_tiles[0] * max_tiles[1]
    sentinel_tile = jnp.float32(grid_w * grid_h)
    ts_f = jnp.float32(tile_size)
    idx_parts, val_parts = [], []
    cand_base = 0
    k_lo = 0
    for k_hi, tier_b in _FSCATTER_TIERS:
        k_hi = min(k_hi, k_cap)
        if k_hi <= k_lo:
            continue
        tier_b = _tier_b_eff(tier_b, n)
        if tier_b is None:
            rows = packed                            # all positions
        else:
            rows = packed[area_order[:tier_b]]
        b = rows.shape[0]
        k = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[None, :]   # (1, K)
        w_i = rows[:, 3:4].astype(jnp.int32)                    # (B, 1)
        tx = rows[:, 1:2].astype(jnp.int32) + k % w_i           # (B, K)
        ty = rows[:, 2:3].astype(jnp.int32) + k // w_i
        slot_f = rows[:, 0:1] + k.astype(jnp.float32)           # exact < 2^24
        live = (k < rows[:, 4:5].astype(jnp.int32)) & (slot_f < s_max)
        if opacities is not None:
            x0 = tx.astype(jnp.float32) * ts_f
            y0 = ty.astype(jnp.float32) * ts_f
            min_sig = _rect_min_sigma(
                rows[:, 7:8], rows[:, 8:9], rows[:, 9:10], rows[:, 10:11],
                rows[:, 11:12], x0, y0, x0 + ts_f, y0 + ts_f)
            live = live & (min_sig <= rows[:, 12:13])
        cand_id = cand_base + jnp.arange(b * (k_hi - k_lo),
                                         dtype=jnp.int32).reshape(b, -1)
        idx = jnp.where(live, slot_f.astype(jnp.int32), s_max + cand_id)
        vals = jnp.stack(
            [(ty * grid_w + tx).astype(jnp.float32),
             jnp.broadcast_to(rows[:, 5:6], tx.shape),
             jnp.broadcast_to(rows[:, 6:7], tx.shape)], axis=-1)
        idx_parts.append(idx.reshape(-1))
        val_parts.append(vals.reshape(-1, 3))
        cand_base += b * (k_hi - k_lo)
        k_lo = k_hi

    buf = jnp.concatenate(
        [jnp.full((s_max, 1), sentinel_tile, jnp.float32),
         jnp.zeros((s_max, 2), jnp.float32)], axis=1)
    # live slots are globally unique (disjoint ranges x disjoint k windows),
    # dead candidates get distinct out-of-range ids -> drop; unique indices
    # let XLA:TPU skip collision handling
    buf = buf.at[jnp.concatenate(idx_parts)].set(
        jnp.concatenate(val_parts), mode="drop", unique_indices=True)
    return (buf[:, 0].astype(jnp.int32), buf[:, 1],
            buf[:, 2].astype(jnp.int32))


# Candidate-sort tier plan (``csort`` decode): tighter than the fscatter
# plan because no slot layout exists — candidate count IS the sort length,
# and the on-chip A/B measured the sort+build cost roughly linear in it
# (binsort 43 ms at the first 8.4M-candidate plan vs scanu's 73 ms).
# Sized from the trained-stats area distribution (area>4: 42.5k, >8: 16.1k,
# >16: 9.8k, >64: 7.3k, >128: 4.7k, >256: 1.8k, >512: 343) with >=1.26x
# headroom per tier boundary: ~5.35M candidates at 524k gaussians (true
# bbox cover is 2.67M — the remaining overhead is the price of static
# shapes; each extra tier costs one B-row gather, so tiers stop where the
# gather (~15 ns/row on-chip) outweighs the sort savings (~5 ns/slot)).
_CSORT_TIERS: tuple[tuple[int, int | None], ...] = (
    (4, None), (8, 57344), (16, 24576), (64, 12544), (128, 9216),
    (256, 6144), (512, 2304), (1024, 512))


def _tier_b_eff(tier_b: int | None, n: int) -> int | None:
    """Tier selection size at scene size ``n``: the plans are sized for the
    524k-gaussian production density, and the big-splat population scales
    roughly with the scene, so scale ``B`` proportionally (floor 256 keeps
    tiny scenes exact; growth above 524k keeps huge scenes covered)."""
    if tier_b is None:
        return None
    return min(n, max(256, tier_b * n // 524288))


def _candidate_sorted_instances(proj: Projected, tile_size: int, grid_w: int,
                         grid_h: int, max_tiles: tuple[int, int],
                         opacities: jax.Array | None = None):
    """Tiered (gaussian, window-tile) candidate expansion WITHOUT slots:
    returns ``(sorted_tile, sorted_gauss)`` of static length sum(B_t * K_t)
    by building the fused ``(tile, quantized depth)`` u32 sort key DIRECTLY
    per candidate (the key bitcast rides the per-gaussian pack as an
    f32-exact integer column — no intermediate tile/depth arrays, no second
    key-packing pass) and running one single-key sort; dead candidates get
    the all-ones key and sink past every real tile. No instance budget
    exists (every covered tile of every selected gaussian is emitted), so
    unlike the slot-layout modes there is NO s_max cut: the only drop is a
    splat ranked below a tier's ``B`` by window area losing its tiles
    beyond that tier's ``k`` range (``tile_overflow_stats`` reports it;
    zero on the trained-stats scene).
    """
    n = proj.mean2d.shape[0]
    n_tiles = grid_w * grid_h
    tile_bits = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
    depth_bits = 32 - tile_bits
    assert (n_tiles << depth_bits) < (1 << 32)
    ex0, ey0, wx, wy = _clamped_windows(proj, tile_size, grid_w, grid_h,
                                        max_tiles)
    area = jnp.where(proj.valid, wx * wy, 0).astype(jnp.int32)
    _, area_order = jax.lax.sort(
        (-area.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)),
        num_keys=1)

    # depth quantization for the fused key, computed once per GAUSSIAN:
    # top (32 - tile_bits) bits of the positive-f32 bit pattern (order-
    # isomorphic; see sort_tile_instances) — an integer < 2^21 at a 32x32
    # grid, so it rides the f32 pack exactly
    db = jax.lax.bitcast_convert_type(
        jnp.maximum(jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0),
                    0.0).astype(jnp.float32), jnp.uint32)
    depth_q = (db >> jnp.uint32(tile_bits)).astype(jnp.float32)

    cols = [
        ex0.astype(jnp.float32),
        ey0.astype(jnp.float32),
        jnp.maximum(wx, 1).astype(jnp.float32),
        area.astype(jnp.float32),
        depth_q,
    ]
    if opacities is not None:
        mean = jax.lax.stop_gradient(proj.mean2d)
        conic = jax.lax.stop_gradient(proj.conic)
        op = jax.lax.stop_gradient(opacities).astype(jnp.float32)
        q_cut = jnp.log(jnp.maximum(op, 1e-12) / ALPHA_CUTOFF)
        cols += [mean[:, 0], mean[:, 1], conic[:, 0], conic[:, 1],
                 conic[:, 2], q_cut]
    packed = jnp.stack(cols, axis=1)                    # (N, 5 or 11)

    k_cap = max_tiles[0] * max_tiles[1]
    ts_f = jnp.float32(tile_size)
    # every selected tier is a PREFIX of area_order, so one gather of the
    # largest prefix serves them all as free slices (random-access gathers
    # run 10-65 ns/row on this chip — halving gather rows is real ms)
    b_all = [_tier_b_eff(b, n) for _, b in _CSORT_TIERS if b is not None]
    b_max = max(b_all) if b_all else 0
    if b_max:
        sel = area_order[:b_max]
        packed_sel = packed[sel]
    key_parts, gauss_parts = [], []
    k_lo = 0
    for k_hi, tier_b in _CSORT_TIERS:
        k_hi = min(k_hi, k_cap)
        if k_hi <= k_lo:
            continue
        tier_b = _tier_b_eff(tier_b, n)
        if tier_b is None:
            rows, gidx = packed, jnp.arange(n, dtype=jnp.int32)
        else:
            gidx = sel[:tier_b]
            rows = packed_sel[:tier_b]
        k = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[None, :]    # (1, K)
        w_i = rows[:, 2:3].astype(jnp.int32)                     # (B, 1)
        tx = rows[:, 0:1].astype(jnp.int32) + k % w_i            # (B, K)
        ty = rows[:, 1:2].astype(jnp.int32) + k // w_i
        live = k < rows[:, 3:4].astype(jnp.int32)
        if opacities is not None:
            x0 = tx.astype(jnp.float32) * ts_f
            y0 = ty.astype(jnp.float32) * ts_f
            min_sig = _rect_min_sigma(
                rows[:, 5:6], rows[:, 6:7], rows[:, 7:8], rows[:, 8:9],
                rows[:, 9:10], x0, y0, x0 + ts_f, y0 + ts_f)
            live = live & (min_sig <= rows[:, 10:11])
        key = ((ty * grid_w + tx).astype(jnp.uint32)
               << jnp.uint32(depth_bits)) \
            | jnp.broadcast_to(rows[:, 4:5], tx.shape).astype(jnp.uint32)
        key_parts.append(
            jnp.where(live, key, jnp.uint32(0xFFFFFFFF)).reshape(-1))
        gauss_parts.append(jnp.broadcast_to(gidx[:, None], tx.shape)
                           .reshape(-1))
        k_lo = k_hi
    skey, sorted_gauss = jax.lax.sort(
        (jnp.concatenate(key_parts), jnp.concatenate(gauss_parts)),
        num_keys=1)
    # dead keys decode to tile 2^tile_bits - 1 >= n_tiles: past every real
    # tile, exactly like the slot modes' n_tiles sentinel
    sorted_tile = (skey >> jnp.uint32(depth_bits)).astype(jnp.int32)
    return sorted_tile, sorted_gauss


def sorted_instances(proj: Projected, tile_size: int, grid_w: int,
                     grid_h: int, max_tiles: tuple[int, int], s_max: int,
                     opacities: jax.Array | None = None):
    """(tile, depth)-sorted ``(sorted_tile, sorted_gauss)`` worklist arrays —
    the single binning entry point both compositor backends consume.

    ``PROMETHEUS_BIN_DECODE`` picks the expansion strategy (an on-chip perf
    A/B, ``tools/raster_profile.py``): the slot-layout modes (``scanu``/
    ``scan``/``addcumsum``/``bsearch``/``fscatter``) return length
    ``s_max``; ``csort`` sorts the tiered candidates directly (no slots, no
    budget cut) and returns the static candidate count. Downstream only
    needs the arrays sorted with sentinels at the end — both lengths work.
    """
    n_tiles = grid_w * grid_h
    if os.environ.get("PROMETHEUS_BIN_DECODE", "csort") == "csort":
        return _candidate_sorted_instances(
            proj, tile_size, grid_w, grid_h, max_tiles, opacities=opacities)
    tile_id, depth_key, gauss_idx = _tile_instances(
        proj, tile_size, grid_w, grid_h, max_tiles, s_max,
        opacities=opacities)
    return sort_tile_instances(tile_id, depth_key, gauss_idx, n_tiles)


def _tile_instances(proj: Projected, tile_size: int, grid_w: int, grid_h: int,
                    max_tiles: tuple[int, int], s_max: int,
                    opacities: jax.Array | None = None):
    """Expand gaussians into (tile_id, depth, gaussian_idx) instances —
    EXACT compact expansion (the static-shape TPU answer to the CUDA
    rasterizer's per-gaussian worklists, matching its exact duplication
    semantics instead of approximating them with fixed per-class windows):

    1. Each gaussian's covered-tile window is its exact bbox, clamped to
       ``max_tiles`` centered on the splat mean.
    2. An exclusive cumsum of the window areas assigns each gaussian a
       contiguous slot range inside a STATIC ``s_max`` instance budget;
       slot -> gaussian is decoded with one scatter of range starts plus a
       cumulative max (``associative_scan``) — O(s_max), no searchsorted.
    3. Gaussians are laid out in DESCENDING-opacity order, so if the scene
       needs more than ``s_max`` instances the budget cut drops the least
       visible splats whole (principled pruning), not arbitrary indices.

    Instance count = TRUE coverage (no 4x-everything small path, no
    budget-selected big path): cheaper than the old hierarchical scheme on
    well-behaved scenes, and exact — the round-2 scheme's big-splat
    failure mode (budget overflow -> top-left-anchored 2x2 fallback) cost
    ~40 dB vs the exact compositor at production density.

    Returns flat ``(tile_id, depth, gauss_idx)`` of length ``s_max``;
    unused slots get tile_id = grid_w * grid_h (sorted to the end).
    """
    if os.environ.get("PROMETHEUS_BIN_DECODE", "scanu") == "fscatter":
        return _tile_instances_fscatter(proj, tile_size, grid_w, grid_h,
                                        max_tiles, s_max,
                                        opacities=opacities)
    n = proj.mean2d.shape[0]
    # the packed decode rows below carry slot starts / gaussian indices in
    # f32, exact only below 2^24 — enforce it statically rather than corrupt
    # the decode silently on a >2.8M-gaussian scene (the 2^10 headroom keeps
    # the f32 prefix-sum dead-classification below exact: beyond 2^24 a
    # rounded prefix can sag by ~an ulp (2) minus a max_tiles cover (<=2^10),
    # and must still compare >= s_max)
    assert s_max < (1 << 24) - (1 << 11) and n < (1 << 24), (
        f"instance budget {s_max} / N {n} exceed f32-exact integer range; "
        "shrink the scene or widen the decode dtype")
    ex0, ey0, wx, wy = _clamped_windows(proj, tile_size, grid_w, grid_h,
                                        max_tiles)
    cover = jnp.where(proj.valid, wx * wy, 0).astype(jnp.int32)

    if opacities is None:
        order = jnp.arange(n, dtype=jnp.int32)
    else:
        op = jax.lax.stop_gradient(opacities).astype(jnp.float32)
        _, order = jax.lax.sort((-jnp.where(jnp.isfinite(op), op, 0.0),
                                 jnp.arange(n, dtype=jnp.int32)), num_keys=1)

    cover_o = cover[order]
    # f32 prefix sums, NOT int32: at the (32, 32) window clamp a cover sum
    # of 2^31 is only ~2.1M gaussians, and an int32 cumsum WRAPS there —
    # wrapped starts land back inside [0, s_max) and silently corrupt the
    # scatter. f32 sums of integers are exact below 2^24 (every live start
    # is — s_max is asserted under it) and stay >= 2^24 - ulp beyond, where
    # the only thing that matters is the ">= s_max, dead" classification.
    ends = jnp.cumsum(cover_o.astype(jnp.float32))
    starts = ends - cover_o.astype(jnp.float32)   # exclusive prefix
    total = jnp.minimum(ends[-1], jnp.float32(s_max)).astype(jnp.int32)

    # slot j -> position p in the ordered layout. Equivalent decodes,
    # selectable for on-chip A/B (tools/raster_profile.py) because they
    # stress different TPU slow paths:
    #   scanu (default): scatter each covered gaussian's position at its
    #     range start, then a running max fills the ranges. Alive range
    #     starts are strictly increasing and dead gaussians map to DISTINCT
    #     out-of-range indices (s_max + pos, dropped), so the scatter has
    #     provably unique indices -> ``unique_indices=True`` lets XLA:TPU
    #     skip collision handling (the r4 on-chip profile measured the
    #     colliding-index variant at 59 ms of an 83 ms render).
    #   scan: same shape, but dead gaussians share the s_max sentinel —
    #     colliding indices, a documented XLA:TPU slow path.
    #   addcumsum: scatter the DELTA between consecutive alive positions at
    #     each range start (unique indices, add-combiner), then a cumsum
    #     telescopes to the owning position per slot.
    #   bsearch: p = searchsorted(ends, j, 'right') — ends is sorted
    #     (nondecreasing cumsum), so the owning gaussian of slot j is the
    #     first p with ends[p] > j; zero-width ranges can never own a slot.
    #     ~log2(N) gather passes, no scatter (10x slower on-chip r4).
    pos = jnp.arange(n, dtype=jnp.int32)
    decode = os.environ.get("PROMETHEUS_BIN_DECODE", "scanu")
    alive = (cover_o > 0) & (starts < s_max)
    starts_i = jnp.where(alive, starts, jnp.float32(s_max)).astype(jnp.int32)
    if decode == "bsearch":
        j32 = jnp.arange(s_max, dtype=jnp.float32)
        p_of_slot = jnp.clip(
            jnp.searchsorted(ends, j32, side="right"), 0, n - 1
        ).astype(jnp.int32)
    elif decode == "scan":
        marks = jnp.zeros((s_max,), jnp.int32).at[
            jnp.where(alive, starts_i, s_max)].max(pos, mode="drop")
        p_of_slot = jax.lax.associative_scan(jnp.maximum, marks)
    elif decode == "addcumsum":
        # previous alive position (exclusive running max over the layout);
        # the first alive gaussian's delta is its own position (base 0).
        run = jax.lax.associative_scan(
            jnp.maximum, jnp.where(alive, pos, -1))
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), run[:-1]])
        delta = pos - jnp.maximum(prev, 0)
        marks = jnp.zeros((s_max,), jnp.int32).at[
            jnp.where(alive, starts_i, s_max + pos)
        ].add(jnp.where(alive, delta, 0), mode="drop", unique_indices=True)
        p_of_slot = jnp.cumsum(marks)
    else:  # scanu
        marks = jnp.zeros((s_max,), jnp.int32).at[
            jnp.where(alive, starts_i, s_max + pos)
        ].max(pos, mode="drop", unique_indices=True)
        p_of_slot = jax.lax.associative_scan(jnp.maximum, marks)

    # pack per-position decode data once -> ONE s_max-row gather (all
    # integer-valued columns < 2^24 so f32 carries them exactly); the extra
    # mean/conic/cutoff columns feed the per-tile exact cull below
    cols = [
        starts.astype(jnp.float32),
        ex0[order].astype(jnp.float32),
        ey0[order].astype(jnp.float32),
        jnp.maximum(wx[order], 1).astype(jnp.float32),
        jnp.where(jnp.isfinite(proj.depth[order]), proj.depth[order], 0.0),
        order.astype(jnp.float32),
    ]
    if opacities is not None:
        # comparisons only (binning gates) — keep them out of the VJP
        mean_o = jax.lax.stop_gradient(proj.mean2d)[order]
        conic_o = jax.lax.stop_gradient(proj.conic)[order]
        op_o = jax.lax.stop_gradient(opacities)[order].astype(jnp.float32)
        # alpha >= cutoff  <=>  sigma <= log(op / cutoff) =: q_cut
        q_cut = jnp.log(jnp.maximum(op_o, 1e-12) / ALPHA_CUTOFF)
        cols += [mean_o[:, 0], mean_o[:, 1], conic_o[:, 0], conic_o[:, 1],
                 conic_o[:, 2], q_cut]
    deco = jnp.stack(cols, axis=1)                # (N, 6 or 12)
    rows = deco[p_of_slot]                        # (s_max, ...)

    j = jnp.arange(s_max, dtype=jnp.int32)
    l = j - rows[:, 0].astype(jnp.int32)
    w_i = rows[:, 3].astype(jnp.int32)
    ty = rows[:, 2].astype(jnp.int32) + l // w_i
    tx = rows[:, 1].astype(jnp.int32) + l % w_i
    ok = j < total
    if opacities is not None:
        # EXACT per-tile cull: if the minimum sigma over this instance's
        # tile rect exceeds the gaussian's cutoff level, every pixel of the
        # tile gets alpha < ALPHA_CUTOFF and the compositors zero it —
        # dropping the instance cannot change the image. Corner tiles of a
        # splat's bounding box commonly fail this test (the ellipse misses
        # the rect), so crowded tiles shed provably-dead instances before
        # the capacity truncation.
        ts_f = jnp.float32(tile_size)
        x0 = tx.astype(jnp.float32) * ts_f
        y0 = ty.astype(jnp.float32) * ts_f
        min_sig = _rect_min_sigma(rows[:, 6], rows[:, 7], rows[:, 8],
                                  rows[:, 9], rows[:, 10],
                                  x0, y0, x0 + ts_f, y0 + ts_f)
        ok = ok & (min_sig <= rows[:, 11])
    tile_id = jnp.where(ok, ty * grid_w + tx,
                        grid_w * grid_h).astype(jnp.int32)
    return tile_id, rows[:, 4], rows[:, 5].astype(jnp.int32)


def default_instance_budget(n: int, factor: int = 6) -> int:
    """Static instance-budget heuristic: trained pixel-aligned scenes need
    ~1.5-3 instances/gaussian; the factor covers big-splat tails.

    Measured on the trained-statistics scene at 512^2/524k (the bench's
    realistic-regime datapoint): with the ISOTROPIC bounding radius the
    scene needed 7.26 instances/gaussian (factor 6 dropped 17% of
    instances -> 51.8 dB vs the exact compositor; 8 -> 120.9 dB,
    never-binding). The per-axis AABB extents (``Projected.rx/ry``) cut the
    bbox cover to 5.09 instances/gaussian, so factor 6 is never-binding
    again (117.3 dB = float-exact at tile capacities 1024 AND 512) at 25%
    less sort than the old 8x budget; the per-tile exact cull then drops
    live instances further to 4.15/gaussian (faster count-bounded
    compositing; budget sizing keys off the PRE-cull bbox cover, which is
    what the slot assignment uses). The binning/sort cost and buffers scale
    linearly with the factor, compositing cost does not (it is
    tile_capacity- and count-bound)."""
    return max(factor * n, 4096)


def tile_overflow_stats(proj: Projected, tile_size: int, grid_w: int,
                        grid_h: int, max_tiles: tuple[int, int],
                        s_max: int | None = None):
    """Diagnostics for the exact-expansion binning's static caps: how many
    valid gaussians have their window clamped by ``max_tiles`` (their
    outer tiles are dropped), the total instance count vs the ``s_max``
    budget, and the max cover observed. Cheap; run it at production
    density when choosing ``max_tiles``/``s_max``/``tile_capacity``."""
    x0, x1, y0, y1 = _tile_bbox(proj, tile_size, grid_w, grid_h)
    nx = (x1 - x0 + 1).astype(jnp.int32)
    ny = (y1 - y0 + 1).astype(jnp.int32)
    valid = proj.valid
    clamped = valid & ((ny > max_tiles[0]) | (nx > max_tiles[1]))
    cover = jnp.where(
        valid,
        jnp.minimum(ny, max_tiles[0]) * jnp.minimum(nx, max_tiles[1]), 0)
    # f32 sum: an int32 total wraps at ~2.1M gaussians x the (32,32) clamp
    total = jnp.sum(cover.astype(jnp.float32))
    if s_max is None:
        s_max = default_instance_budget(int(proj.mean2d.shape[0]))

    def tier_overflow(tiers):
        # gaussians whose window outranks a tier's B selection lose their
        # tiles in that tier's k range; zero = the tiered expansion is exact
        v = jnp.int32(0)
        k_lo = 0
        for k_hi, tier_b in tiers:
            if tier_b is not None:
                over = jnp.sum((cover > k_lo).astype(jnp.int32)) - tier_b
                v = v + jnp.maximum(over, 0)
            k_lo = k_hi
        return v

    return {
        "csort_tier_overflow": tier_overflow(_CSORT_TIERS),
        "fscatter_tier_overflow": tier_overflow(_FSCATTER_TIERS),
        "n_valid": jnp.sum(valid.astype(jnp.int32)),
        "n_window_clamped": jnp.sum(clamped.astype(jnp.int32)),
        "instances_needed": total,
        "instance_budget": jnp.int32(s_max),
        "instances_over_budget": jnp.maximum(total - s_max, 0.0),
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
                                   "max_tiles_y", "max_tiles_x", "chunk",
                                   "s_max"))
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
    s_max: int | None = None,
):
    """Render one view. Returns ``(rgb (H,W,3), expected_depth (H,W), alpha (H,W))``.

    ``rgb`` is NOT background-blended (the renderer layer blends).
    ``s_max`` is the static instance budget of the exact-expansion binning
    (None -> ``default_instance_budget(N)``).
    """
    assert img_h % tile_size == 0 and img_w % tile_size == 0
    chunk = min(chunk, tile_capacity)
    assert tile_capacity % chunk == 0
    grid_h, grid_w = img_h // tile_size, img_w // tile_size
    n_tiles = grid_h * grid_w
    if s_max is None:
        s_max = default_instance_budget(proj.mean2d.shape[0])

    # (tile, depth) order via one fused-key sort; invalid instances sink to
    # the end (sentinel tile id is the largest).
    sorted_tile, sorted_gauss = sorted_instances(
        proj, tile_size, grid_w, grid_h, (max_tiles_y, max_tiles_x),
        s_max, opacities=opacities)

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
