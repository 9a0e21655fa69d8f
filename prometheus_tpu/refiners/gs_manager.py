"""Fixed-capacity Gaussian parameter buffer: densify/split/clone/prune under jit.

TPU-first redesign of the reference's ``GaussiansManeger``
(``modules/refiners/gs_utils.py:35-208``): instead of torch optimizer-state
surgery over ragged tensors, gaussians live in a static-capacity buffer with
an ``alive`` mask. Densify-clone/split write into free slots via masked
scatter; prune just clears mask bits; the optimizer state (Adam moments)
shares the buffer layout so "surgery" is a masked copy — all static shapes,
all jit-compatible.

Raw (pre-activation) parameterization matches 3DGS: logit opacity, log
scales, raw colors (logit), unnormalized quaternions.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _inverse_sigmoid(x, eps=1e-6):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class GaussianBuffer(NamedTuple):
    xyz: jax.Array          # (C, 3)
    feats_raw: jax.Array    # (C, 3)  logit color
    opacity_raw: jax.Array  # (C,)    logit opacity
    scales_raw: jax.Array   # (C, 3)  log scales
    rots_raw: jax.Array     # (C, 4)
    alive: jax.Array        # (C,) bool


def make_buffer(gaussians, capacity: int) -> GaussianBuffer:
    """Activated gaussian tuple (1, N, ...) or (N, ...) -> raw buffer."""
    xyz, feats, opacity, scales, rots = gaussians
    if xyz.ndim == 3:
        xyz, feats, opacity, scales, rots = (
            a[0] for a in (xyz, feats, opacity, scales, rots))
    n = xyz.shape[0]
    assert capacity >= n, f"capacity {capacity} < {n} gaussians"
    pad = capacity - n

    def padded(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0)

    # dead-slot padding must stay geometrically non-degenerate: zero quats or
    # unit scales create inf intermediates whose 0-opacity-masked gradients
    # become NaN (0 * inf)
    rots_pad = jnp.concatenate(
        [rots, jnp.tile(jnp.asarray([1.0, 0, 0, 0], rots.dtype), (pad, 1))], 0)
    return GaussianBuffer(
        xyz=padded(xyz),
        feats_raw=padded(_inverse_sigmoid(feats.reshape(n, -1)[:, :3])),
        opacity_raw=padded(_inverse_sigmoid(opacity[:, 0]), fill=-10.0),
        scales_raw=padded(jnp.log(jnp.maximum(scales, 1e-8)), fill=-6.0),
        rots_raw=rots_pad,
        alive=jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)]),
    )


def activate(buf: GaussianBuffer):
    """Buffer -> activated gaussian tuple (1, C, ...); dead slots get zero
    opacity so they never rasterize."""
    op = jax.nn.sigmoid(buf.opacity_raw) * buf.alive
    norm = jnp.linalg.norm(buf.rots_raw, axis=-1, keepdims=True)
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0], buf.rots_raw.dtype)
    # double-where: near-zero quats fall back to identity without the
    # 1/eps gradient blowup of a bare maximum() guard
    rots = jnp.where(norm > 1e-4, buf.rots_raw / jnp.maximum(norm, 1e-4),
                     ident)
    return (
        buf.xyz[None],
        jax.nn.sigmoid(buf.feats_raw)[None, :, None, :],
        op[None, :, None],
        jnp.exp(buf.scales_raw)[None],
        rots[None],
    )


def num_alive(buf: GaussianBuffer) -> jax.Array:
    return buf.alive.sum()


def densify_and_prune(
    buf: GaussianBuffer,
    grad_stat: jax.Array,       # (C,) accumulated screen-grad magnitude
    key: jax.Array,
    *,
    grad_threshold: float = 2e-4,
    split_scale_threshold: float = 0.02,
    opacity_prune: float = 0.005,
    scale_prune_max: float = 0.5,
    max_new: int = 4096,
) -> GaussianBuffer:
    """One densify+prune round (3DGS semantics, static shapes).

    - candidates: alive & grad_stat > threshold
      - small scales -> CLONE (copy, nudged along the gradient direction)
      - large scales -> SPLIT (two smaller copies; original shrinks)
    - prune: opacity below threshold or scales beyond max.
    At most ``max_new`` new gaussians per round (top-k by grad stat),
    limited by free capacity.
    """
    C = buf.xyz.shape[0]
    scal = jnp.exp(buf.scales_raw).max(-1)
    cand = buf.alive & (grad_stat > grad_threshold)
    # rank candidates by stat; take up to max_new
    score = jnp.where(cand, grad_stat, -jnp.inf)
    k = min(max_new, C)
    top_score, top_idx = jax.lax.top_k(score, k)
    valid_new = jnp.isfinite(top_score)

    # destination free slots: indices of dead entries, ranked first
    free_rank = jnp.argsort(buf.alive)  # False (dead) sorts before True
    dst_idx = free_rank[:k]
    dst_ok = ~buf.alive[dst_idx] & valid_new

    src = top_idx
    is_split = scal[src] > split_scale_threshold

    # new entries: copies of src, perturbed; splits get 0.8x down-scaled
    knoise = jax.random.normal(key, (k, 3))
    src_scales = jnp.exp(buf.scales_raw[src])
    offset = knoise * src_scales
    new_xyz = buf.xyz[src] + jnp.where(is_split[:, None], offset, 0.0)
    new_scales_raw = buf.scales_raw[src] - jnp.where(
        is_split[:, None], jnp.log(1.6), 0.0)

    def scatter(arr, updates):
        return arr.at[dst_idx].set(
            jnp.where(dst_ok.reshape((-1,) + (1,) * (updates.ndim - 1)),
                      updates, arr[dst_idx]))

    out = GaussianBuffer(
        xyz=scatter(buf.xyz, new_xyz),
        feats_raw=scatter(buf.feats_raw, buf.feats_raw[src]),
        opacity_raw=scatter(buf.opacity_raw, buf.opacity_raw[src]),
        scales_raw=scatter(buf.scales_raw, new_scales_raw),
        rots_raw=scatter(buf.rots_raw, buf.rots_raw[src]),
        alive=buf.alive.at[dst_idx].set(
            jnp.where(dst_ok, True, buf.alive[dst_idx])),
    )
    # the split originals also shrink
    shrink = jnp.zeros(C, bool).at[src].set(is_split & valid_new & dst_ok)
    out = out._replace(
        scales_raw=jnp.where(shrink[:, None],
                             out.scales_raw - jnp.log(1.6), out.scales_raw))
    # prune
    op = jax.nn.sigmoid(out.opacity_raw)
    keep = out.alive & (op > opacity_prune) & \
        (jnp.exp(out.scales_raw).max(-1) < scale_prune_max)
    return out._replace(alive=keep)
