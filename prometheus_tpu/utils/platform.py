"""Platform selection helper for CLI entry points.

The axon TPU plugin IGNORES the ``JAX_PLATFORMS`` environment variable
(CLAUDE.md environment note) — honoring it requires
``jax.config.update("jax_platforms", ...)`` BEFORE any jax use. Every CLI
calls this first so ``JAX_PLATFORMS=cpu python inference.py ...`` behaves
as documented on any backend.
"""
from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass  # backend already initialized


def device_sync(x) -> None:
    """Force completion of the computation producing ``x`` with a REAL
    device->host fetch.

    ``jax.block_until_ready`` does NOT block over the tunneled axon backend
    (CLAUDE.md environment note) — any wall-clock timing that ends with it
    measures dispatch, not execution. Every CLI timing boundary must use
    this instead: fetching one element cannot complete until the producing
    program has."""
    import jax

    leaf = next((l for l in jax.tree.leaves(x)
                 if isinstance(l, jax.Array)), None)
    if leaf is not None:
        jax.device_get(leaf.ravel()[0:1])
