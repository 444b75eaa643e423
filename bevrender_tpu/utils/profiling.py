"""Tracing / profiling hooks (SURVEY 5.1 — absent in the reference; its only
artifact is a commented-out CUDA-memory log line, train.py:590).

Thin wrappers over ``jax.profiler`` plus a per-step wall-clock timer that
blocks on device completion so the numbers mean something."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profile viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotation(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Blocking per-step timer with simple stats."""

    def __init__(self):
        self.times: list = []

    @contextlib.contextmanager
    def step(self, result_to_block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        self.times.append(time.perf_counter() - t0)

    def stats(self, skip_first: int = 1) -> Dict[str, float]:
        t = self.times[skip_first:] or self.times
        if not t:
            return {}
        return {
            "mean_s": sum(t) / len(t),
            "min_s": min(t),
            "max_s": max(t),
            "steps": len(t),
        }


def device_memory_stats() -> Optional[Dict[str, int]]:
    """HBM usage of the first device (replaces the commented CUDA-memory log,
    train.py:590)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
