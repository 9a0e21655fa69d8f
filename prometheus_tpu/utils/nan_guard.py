"""NaN/Inf guards — the debug-mode numerics analog of the reference.

The reference wraps VAE stages in a NaN-check context
(``vae_hacked.py:20-46``) and flips on ``torch.autograd.detect_anomaly`` in
debug runs (``train.py:145``). The JAX equivalents here:

- ``enable_nan_debug()``: flip ``jax_debug_nans`` — XLA re-runs any op that
  produced a NaN un-jitted and raises with the op location (the
  detect-anomaly analog; slows compiles, debug only).
- ``check_finite(tree, name)``: inside-jit guard via
  ``equinox``-style ``jax.debug`` callback-free error: uses
  ``jax.lax.cond`` + ``jax.debug.print`` so it costs one reduction per leaf
  and never host-syncs.
- ``assert_finite(tree, name)``: host-side hard check (eager contexts:
  data pipeline outputs, checkpoint loads).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_debug(enable: bool = True) -> None:
    """detect-anomaly analog: raise at the op that produced a NaN."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree, name: str = "tensor"):
    """Inside-jit guard: prints a loud message (device-side) if any leaf of
    ``tree`` contains NaN/Inf. Returns ``tree`` unchanged, so it composes as
    ``x = check_finite(x, "vae.decode")``. Zero host syncs."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return tree
    bad = jnp.zeros((), jnp.bool_)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            bad = bad | ~jnp.all(jnp.isfinite(leaf))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print(
            "[nan-guard] NON-FINITE values in {n}", n=name),
        lambda: None,
    )
    return tree


def assert_finite(tree, name: str = "tensor") -> None:
    """Host-side hard check for eager contexts (data batches, loaded
    checkpoints): raises ``FloatingPointError`` listing offending leaves."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(
            f"[nan-guard] non-finite values in {name}: {bad[:8]}"
            + (f" (+{len(bad) - 8} more)" if len(bad) > 8 else ""))
