"""Tracing / profiling hooks.

The reference's only instrumentation is tqdm bars and wall-clock deltas in
run logs (`src/trainers.py:89-92`, `repo-b/train_test.py:19-20`). Here:

- `trace(dir)` wraps a region in a `jax.profiler` trace (viewable in
  TensorBoard / Perfetto), enabled from the CLI via `--profile <dir>`;
- `annotate(name)` tags sub-regions (input build, train scan, eval scan)
  so device timelines attribute time to pipeline stages;
- `Throughput` accumulates steady-state examples/s, skipping the first
  (compile-inflated) observation — matching how BASELINE.md derives the
  reference's steady-state epoch numbers.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the enclosed region into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region for device timeline attribution."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Steady-state examples/s accumulator (first observation = compile)."""

    def __init__(self):
        self._t0 = None
        self._samples = 0.0
        self._seconds = 0.0
        self._warm = False

    def start(self):
        self._t0 = time.time()

    def stop(self, n_examples: int) -> float:
        dt = time.time() - self._t0
        rate = n_examples / dt if dt > 0 else 0.0
        if self._warm:  # skip the compile epoch
            self._samples += n_examples
            self._seconds += dt
        self._warm = True
        return rate

    @property
    def steady_rate(self) -> float:
        return self._samples / self._seconds if self._seconds > 0 else 0.0
