"""Tests for utils/platform.py — the CLI timing-sync helper.

``device_sync`` exists because ``jax.block_until_ready`` does NOT block over
the tunneled axon TPU backend (CLAUDE.md environment note): any CLI timing
must end with a real device->host fetch. These tests pin the helper's
contract on arbitrary pytrees.
"""
import jax.numpy as jnp
import numpy as np

from prometheus_tpu.utils.platform import device_sync


def test_device_sync_jax_array():
    device_sync(jnp.ones((4, 4)))  # must not raise


def test_device_sync_pytree_mixed():
    # dict with numpy + jax leaves; numpy-only leaf first to prove it skips
    device_sync({"a": np.ones(3), "b": jnp.arange(5), "c": [1, 2]})


def test_device_sync_no_jax_leaves():
    # pure-host pytrees are a no-op, not an error
    device_sync({"a": np.ones(3), "b": "text"})
    device_sync(None)
