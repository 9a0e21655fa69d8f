"""Profiling & step timing (SURVEY.md §5: the reference has none beyond tqdm;
this provides the TPU-native observability the rebuild plan calls for).

- :func:`trace` — context manager around ``jax.profiler`` traces (view in
  TensorBoard / Perfetto).
- :class:`StepTimer` — EMA step timing with tokens/images-per-second rates.
- :func:`annotate` — named trace annotations for async dispatch regions.
- :func:`device_memory_stats` — per-device HBM usage snapshot.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/prometheus_trace"):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation context (shows up inside profiler traces)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with EMA smoothing and throughput helpers."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: float | None = None
        self._t0: float | None = None
        self.steps = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else \
            self.ema * self.avg + (1 - self.ema) * dt
        self.steps += 1
        return dt

    @contextlib.contextmanager
    def measure(self, sync=None):
        """Times the block; pass an array/pytree as ``sync`` to block on it.

        Uses a real device->host fetch: ``jax.block_until_ready`` does not
        block over the tunneled axon TPU backend, which would silently turn
        this into a dispatch-time measurement."""
        from prometheus_tpu.utils.platform import device_sync
        self.start()
        yield
        if sync is not None:
            device_sync(sync)
        self.stop()

    def rate(self, items_per_step: float) -> float:
        """items/second at the current EMA step time."""
        return items_per_step / self.avg if self.avg else 0.0


def device_memory_stats() -> list[dict]:
    """Per-device memory snapshot (bytes in use / limit when available)."""
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
        })
    return out
