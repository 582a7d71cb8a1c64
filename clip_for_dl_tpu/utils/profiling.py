"""Tracing / profiling (SURVEY.md §5.1).

The reference measures wall clock with time.time() and AverageMeters and
reads host RSS via psutil; no profiler. TPU-native replacements:

- `trace` / `annotate`: jax.profiler Perfetto traces + named regions that
  show up on the TPU timeline.
- `FencedTimer`: wall-clock timing fenced by a device fetch (on some
  transports block_until_ready alone does not fence — measured in bench.py).
- `throughput`: images/sec helper used by the benchmark and the train loop.
- `device_memory_stats`: per-device HBM live/peak bytes (the psutil RSS
  counterpart, but for the chip).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a Perfetto/XPlane trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the device timeline (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)


def fence(tree: Any) -> Any:
    """Force completion AND availability of every array in the pytree."""
    leaves = [x for x in jax.tree.leaves(tree) if isinstance(x, jax.Array)]
    for leaf in leaves:
        np.asarray(jax.device_get(leaf))
    return tree


class FencedTimer:
    """with FencedTimer() as t: ... ; t.seconds — fenced by device fetch."""

    def __init__(self, result: Any = None):
        self._result = result
        self.seconds: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def set_result(self, result: Any) -> None:
        self._result = result

    def __exit__(self, *exc):
        if self._result is not None:
            fence(self._result)
        self.seconds = time.perf_counter() - self._t0
        return False


def throughput(n_items: int, seconds: float) -> float:
    return n_items / max(seconds, 1e-12)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    out: Dict[str, Dict[str, int]] = {}
    for dev in jax.devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(dev)] = {
                k: int(v)
                for k, v in stats.items()
                if isinstance(v, (int, np.integer))
            }
    return out


class StepTimer:
    """Rolling steps/sec + items/sec for the training loop (the batch_time /
    data_time AverageMeter pair, fenced)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_step_seconds(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    def items_per_sec(self, batch_size: int) -> float:
        s = self.mean_step_seconds
        return batch_size / s if s and np.isfinite(s) else float("nan")
