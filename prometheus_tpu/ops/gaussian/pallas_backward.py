"""Pallas backward kernel for tile compositing + the full custom-VJP wrapper.

Completes the from-scratch rasterizer (SURVEY.md hard part #1): with this,
``composite_pallas_diff`` is a drop-in differentiable compositor whose
forward AND backward run as Pallas TPU kernels, with the projection math
differentiated by XLA autodiff around them.

Backward math (per pixel p, instances i front-to-back, w_i = alpha_i T_i):

    C       = sum_i c_i w_i            (+ background handled outside)
    A       = sum_i w_i
    u_i     = c_i . gC_p + z_i . gZ_p + gA_p          (value-dot-grad)
    dL/dalpha_i = u_i T_i - S_i / (1 - alpha_i)
        where S_i = sum_{j>i} u_j w_j  (suffix sums: strictly-UPPER-tri
        matmuls within a chunk + a carried total across chunks, walking the
        chunks in reverse)
    dL/dc_i = gC_p w_i ;  dL/dz_i = gZ_p w_i   (accumulated over pixels
        as (C, P) @ (P, ch) MXU matmuls)
    dL/dsigma_i = -alpha_i dL/dalpha_i ;  dL/do_i = exp(-sigma) dL/dalpha_i
    chain to mean2d/conic via the quadratic form.

The kernel recomputes alpha/T (flash-attention-style rematerialization): a
first forward sweep accumulates the total log-transmittance, then the
reverse sweep reconstructs each chunk's starting T in log space by
subtracting chunk totals — exact, and free of dynamic-index scratch stores
(which Mosaic cannot prove lane-aligned).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .naive import ALPHA_CUTOFF, MAX_ALPHA
from .pallas_kernel import (
    CHUNK,
    N_CH,
    _PREC,
    _CH_CA,
    _CH_CB,
    _CH_CC,
    _CH_MEANX,
    _CH_MEANY,
    _CH_OP,
    _CH_R,
    _CH_Z,
    gather_rows,
    run_compositor_kernel,
    sorted_tile_segments,
)
from .projection import Projected


def _bwd_kernel(counts_ref, data_ref, gout_ref, gdata_ref, *,
                tile_size, grid_w, capacity):
    """grads wrt the packed tile data.

    blocks: data (1, 16, K); gout (1, 8, P) upstream grads packed as rows
    [gC r, g, b, gZ, gA, 0, 0, 0]; out gdata (1, 16, K) with the same channel
    rows as data (mean2d, conic, color, opacity, depth; pad rows zero).
    Chunk loops are bounded by the tile's real instance count
    (scalar-prefetched ``counts``); untouched worklist slots get zero grads.
    """
    p = tile_size * tile_size
    t = pl.program_id(0)
    # the while loops below skip dead chunks -> zero the whole grad block
    gdata_ref[0] = jnp.zeros((gdata_ref.shape[1], gdata_ref.shape[2]),
                             jnp.float32)
    x0 = (t % grid_w) * tile_size
    y0 = (t // grid_w) * tile_size

    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px_x = (pix % tile_size + x0).astype(jnp.float32) + 0.5
    px_y = (pix // tile_size + y0).astype(jnp.float32) + 0.5

    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    l_strict = (row_i < col_j).astype(jnp.float32)   # exclusive prefix (fwd)
    u_strict = (row_i > col_j).astype(jnp.float32)   # exclusive suffix (bwd)

    n_chunks = (counts_ref[t] + CHUNK - 1) // CHUNK

    def alphas_of(k):
        blk = data_ref[0, :, pl.ds(k * CHUNK, CHUNK)]
        dx = px_x - blk[_CH_MEANX][None, :]
        dy = px_y - blk[_CH_MEANY][None, :]
        sigma = 0.5 * (blk[_CH_CA][None, :] * dx * dx
                       + blk[_CH_CC][None, :] * dy * dy) \
            + blk[_CH_CB][None, :] * dx * dy
        alpha_raw = blk[_CH_OP][None, :] * jnp.exp(-jnp.minimum(sigma, 30.0))
        live = (alpha_raw >= ALPHA_CUTOFF) & (alpha_raw < MAX_ALPHA) \
            & (sigma >= 0)
        alpha = jnp.where((alpha_raw >= ALPHA_CUTOFF) & (sigma >= 0),
                          jnp.minimum(alpha_raw, MAX_ALPHA), 0.0)
        return blk, dx, dy, alpha, live

    # ---- pass 1 (forward): total log-transmittance only; the reverse pass
    # reconstructs each chunk's starting T in log space (no dynamic-index
    # scratch stores, which Mosaic cannot prove lane-aligned) ----
    def fwd(k, log_t):
        _, _, _, alpha, _ = alphas_of(k)
        return log_t + jnp.sum(jnp.log1p(-alpha), axis=1, keepdims=True)

    log_t_final = jax.lax.fori_loop(0, n_chunks, fwd,
                                    jnp.zeros((p, 1), jnp.float32))

    g = gout_ref[0]                                    # (8, P)
    g_rgb = g[0:3].T                                   # (P, 3)
    g_z = g[3:4].T                                     # (P, 1)
    g_a = g[4:5].T                                     # (P, 1)

    # ---- pass 2 (reverse): suffix sums + per-instance grads ----
    def bwd(kk, carry):
        suffix_carry, log_t_after = carry
        k = n_chunks - 1 - kk
        blk, dx, dy, alpha, live = alphas_of(k)
        logs = jnp.log1p(-alpha)
        chunk_total = jnp.sum(logs, axis=1, keepdims=True)
        log_t_start = log_t_after - chunk_total
        cum = jnp.dot(logs, l_strict, preferred_element_type=jnp.float32, precision=_PREC)
        t_in = jnp.exp(cum + log_t_start)                   # T_i  (P, C)
        w = alpha * t_in
        # value-dot-grad per (pixel, instance)
        cd = jnp.concatenate([blk[_CH_R:_CH_R + 3], blk[_CH_Z:_CH_Z + 1]], 0)
        g_cz = jnp.concatenate([g_rgb, g_z], 1)             # (P, 4)
        u = jnp.dot(g_cz, cd, preferred_element_type=jnp.float32, precision=_PREC) + g_a
        uw = u * w
        # suffix over later instances: within-chunk upper-tri + carry
        suffix = jnp.dot(uw, u_strict,
                         preferred_element_type=jnp.float32, precision=_PREC) + suffix_carry
        one_m = jnp.maximum(1.0 - alpha, 1e-3)  # alpha clamped at 0.999
        d_alpha = u * t_in - suffix / one_m
        d_alpha = jnp.where(live, d_alpha, 0.0)
        d_sigma = -alpha * d_alpha
        # accumulate per-instance grads (reduce over pixels)
        d_op = jnp.sum(jnp.where(live, d_alpha, 0.0)
                       * jnp.where(blk[_CH_OP][None, :] > 0,
                                   alpha / jnp.maximum(
                                       blk[_CH_OP][None, :], 1e-8), 0.0),
                       axis=0)
        a_c = blk[_CH_CA][None, :]
        b_c = blk[_CH_CB][None, :]
        c_c = blk[_CH_CC][None, :]
        dsig_dx = a_c * dx + b_c * dy
        dsig_dy = c_c * dy + b_c * dx
        d_meanx = jnp.sum(d_sigma * (-dsig_dx), axis=0)
        d_meany = jnp.sum(d_sigma * (-dsig_dy), axis=0)
        d_ca = jnp.sum(d_sigma * 0.5 * dx * dx, axis=0)
        d_cb = jnp.sum(d_sigma * dx * dy, axis=0)
        d_cc = jnp.sum(d_sigma * 0.5 * dy * dy, axis=0)
        d_col = jnp.dot(g_rgb.T, w, preferred_element_type=jnp.float32, precision=_PREC)  # (3, C)
        d_z = jnp.dot(g_z.T, w, preferred_element_type=jnp.float32, precision=_PREC)      # (1, C)

        grads = jnp.concatenate([
            d_meanx[None, :], d_meany[None, :],
            d_ca[None, :], d_cb[None, :], d_cc[None, :],
            d_col, d_op[None, :], d_z,
            jnp.zeros((N_CH - 10, CHUNK), jnp.float32),
        ], axis=0)                                          # (16, C)
        gdata_ref[0, :, pl.ds(k * CHUNK, CHUNK)] = grads
        return (suffix_carry + jnp.sum(uw, axis=1, keepdims=True),
                log_t_start)

    jax.lax.fori_loop(0, n_chunks, bwd,
                      (jnp.zeros((p, 1), jnp.float32), log_t_final))


def _pallas_backward(data, gout, counts, img_h, img_w, tile_size, capacity,
                     interpret=False):
    grid_h, grid_w = img_h // tile_size, img_w // tile_size
    n_tiles = grid_h * grid_w
    p = tile_size * tile_size
    return pl.pallas_call(
        partial(_bwd_kernel, tile_size=tile_size, grid_w=grid_w,
                capacity=capacity),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, N_CH, capacity), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((1, 8, p), lambda t, c: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, N_CH, capacity),
                                   lambda t, c: (t, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, N_CH, capacity), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(counts, data, gout)


# ---------------------------------------------------------------------------
# custom-VJP compositor
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def composite_pallas_diff(mean2d, conic, depth, radii, validf, colors,
                          opacities, img_h, img_w, tile_size, capacity,
                          max_tiles, interpret, s_max):
    """Differentiable Pallas compositor over pre-projected gaussians.

    ``radii`` ((N, 3): isotropic radius + per-axis rx/ry extents) and
    ``validf`` (float 0/1 mask) only gate binning; their gradients are
    zero. Returns (rgb, expected_depth, alpha)."""
    out, _ = _fwd(mean2d, conic, depth, radii, validf, colors, opacities,
                  img_h, img_w, tile_size, capacity, max_tiles, interpret,
                  s_max)
    return out


def _fwd(mean2d, conic, depth, radii, validf, colors, opacities, img_h,
         img_w, tile_size, capacity, max_tiles, interpret, s_max):
    """Bin ONCE; save the binned worklists + segment indices + forward
    outputs as residuals so the backward never re-sorts or re-gathers
    (the binning sort dominates the stage at production density)."""
    proj = Projected(mean2d, conic, depth, radii[:, 0], validf > 0.5,
                     rx=radii[:, 1], ry=radii[:, 2])
    idx, in_seg, counts = sorted_tile_segments(proj, img_h, img_w, tile_size,
                                               capacity, max_tiles, s_max,
                                               opacities=opacities)
    data = gather_rows(proj, colors, opacities, idx, in_seg)
    rgb, dep, acc_a = run_compositor_kernel(data, counts, img_h, img_w,
                                            tile_size, capacity, interpret)
    # mean2d rides along only as the (static) gaussian-count shape carrier
    return (rgb, dep, acc_a), (data, idx, in_seg, counts, dep, acc_a, mean2d)


def _bwd(img_h, img_w, tile_size, capacity, max_tiles, interpret, s_max,
         res, gouts):
    data, idx, in_seg, counts, dep, acc_a, mean2d = res
    n = mean2d.shape[0]
    g_rgb, g_dep, g_alpha = gouts
    grid_h, grid_w = img_h // tile_size, img_w // tile_size
    p = tile_size * tile_size

    # Chain the expected-depth division (ED = acc_d / max(alpha, eps)) and
    # re-pack upstream grads into the kernel's (T, 8, P) layout.
    safe_a = jnp.maximum(acc_a, 1e-10)
    g_acc_d = g_dep / safe_a
    g_a_total = g_alpha - g_dep * dep / safe_a

    def tile_pack(img):  # (H, W, c) -> (T, c, P)
        c = img.shape[-1]
        out = img.reshape(grid_h, tile_size, grid_w, tile_size, c)
        return out.transpose(0, 2, 4, 1, 3).reshape(grid_h * grid_w, c, p)

    gout = jnp.concatenate([
        tile_pack(g_rgb),
        tile_pack(g_acc_d[..., None]),
        tile_pack(g_a_total[..., None]),
        jnp.zeros((grid_h * grid_w, 3, p), jnp.float32),
    ], axis=1)

    gdata = _pallas_backward(data, gout, counts, img_h, img_w, tile_size,
                             capacity, interpret=interpret)

    flat_idx = idx.reshape(-1)
    mask = in_seg.reshape(-1)[:, None]

    def seg(ch_lo, ch_hi):
        vals = gdata[:, ch_lo:ch_hi, :].transpose(0, 2, 1).reshape(
            -1, ch_hi - ch_lo)
        return jax.ops.segment_sum(jnp.where(mask, vals, 0.0), flat_idx,
                                   num_segments=n)

    d_mean2d = seg(0, 2)
    d_conic = seg(2, 5)
    d_colors = seg(5, 8)
    d_op = seg(8, 9)[:, 0]
    d_depth = seg(9, 10)[:, 0]
    zeros_n = jnp.zeros((n,), jnp.float32)
    return (d_mean2d, d_conic, d_depth, jnp.zeros((n, 3), jnp.float32),
            zeros_n, d_colors, d_op)


composite_pallas_diff.defvjp(_fwd, _bwd)


def composite_tiled_pallas_grad(proj: Projected, colors, opacities,
                                img_h, img_w, tile_size: int = 16,
                                capacity: int = 512,
                                max_tiles: tuple = (4, 4),
                                interpret: bool = False,
                                s_max: int | None = None):
    """Differentiable entry point matching ``composite_tiled``'s signature."""
    from .projection import bbox_extents

    rx, ry = bbox_extents(proj)
    radii = jnp.stack([proj.radius, rx, ry], axis=-1)
    return composite_pallas_diff(
        proj.mean2d, proj.conic, proj.depth, radii,
        proj.valid.astype(jnp.float32), colors, opacities,
        img_h, img_w, tile_size, capacity, max_tiles, interpret, s_max)
