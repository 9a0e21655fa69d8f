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
