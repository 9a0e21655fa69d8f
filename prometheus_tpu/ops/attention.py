"""Attention dispatch: XLA fused attention or Pallas TPU flash-attention.

Replaces the reference's ``xformers.ops.memory_efficient_attention`` call
sites (``unet_hacked.py:531``, ``vae_hacked.py:314``, ``ray_diff.py:487``).
The cross-view "3D" attention flattens all views into one sequence
(N_views * H * W / 64 tokens, e.g. 8 x 1024 = 8192 at 256^2), which maps
directly onto the Pallas flash kernel; short sequences and cross-attention to
77 text tokens stay on the plain XLA path (fusion already handles them).

Layout convention here is ``(batch, seq, heads, head_dim)`` (BTNH).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Pallas flash attention wants sequence lengths >= its block size; below this
# the XLA path is faster anyway.
_FLASH_MIN_SEQ = 512


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.cache
def _flash_fn():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    return flash_attention, BlockSizes


@functools.cache
def _block_sizes(seq_q: int, seq_k: int):
    """Tuned block sizes: the library defaults leave ~4x on the table at the
    cross-view shapes (measured on v5e at (2,5,8192,64): 19.9 ms default vs
    5.0 ms with 1024-wide blocks — 34 TFLOPs; same ranking at (16,5,1024)).

    Q- and K-blocks are derived from their own sequence lengths so an
    explicit ``backend='flash'`` cross-attention (Tq != Tk) gets legal
    blocking; if either length doesn't tile we fall back to kernel defaults.
    """
    _, BlockSizes = _flash_fn()
    bq = min(1024, seq_q)
    bk = min(1024, seq_k)
    if seq_q % bq or seq_k % bk:
        return None   # let the kernel pick its defaults
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)


def _xla_attention(q, k, v, scale):
    # (B, T, H, D) -> einsum path; accumulate logits/weights in fp32.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def scaled_dot_product_attention(
    q: jax.Array,  # (B, Tq, H, D)
    k: jax.Array,  # (B, Tk, H, D)
    v: jax.Array,  # (B, Tk, H, D)
    backend: str = "auto",
) -> jax.Array:
    """Non-causal attention, output ``(B, Tq, H, D)``.

    ``backend``: ``auto`` | ``xla`` | ``flash`` (Pallas TPU kernel).
    """
    scale = q.shape[-1] ** -0.5
    use_flash = backend == "flash" or (
        backend == "auto"
        and _on_tpu()
        and q.shape[1] >= _FLASH_MIN_SEQ
        and q.shape[1] == k.shape[1]
        and q.shape[1] % 128 == 0
    )
    if use_flash:
        flash_attention, _ = _flash_fn()
        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))  # BHTD
        out = flash_attention(
            qt, kt, vt, causal=False, sm_scale=scale,
            block_sizes=_block_sizes(q.shape[1], k.shape[1]))
        return jnp.swapaxes(out, 1, 2)
    return _xla_attention(q, k, v, scale)
