"""Tracing/profiling hooks — a subsystem the reference lacks entirely
(SURVEY.md §5: only tqdm bars and wall-clock prints).

- :class:`StepTimer` — per-step wall-clock + examples/s accounting with
  jitter-free block_until_ready sampling.
- :func:`trace` — context manager around `jax.profiler` writing a TensorBoard
  trace (XLA + host) to a directory.
- :func:`annotate` — named TraceAnnotation for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace (open with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host annotation visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing. Call ``tick(n_examples)`` after each step;
    periodically call ``sample(tree)`` with a device output to synchronize
    (avoids measuring only dispatch time under async execution)."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._examples = 0
        self.history: List[Dict[str, float]] = []

    def tick(self, n_examples: int, sync_value=None) -> Optional[Dict[str, float]]:
        self._steps += 1
        self._examples += n_examples
        if self._steps % self.sync_every == 0:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            dt = time.perf_counter() - self._t0
            stats = {
                "steps": self._steps,
                "seconds": dt,
                "steps_per_sec": self._steps / dt,
                "examples_per_sec": self._examples / dt,
            }
            self.history.append(stats)
            return stats
        return None
