"""Profiling utilities: jax.profiler traces + named scopes (SURVEY §5 —
replaces the reference's ad-hoc wall-clock prints with real TPU traces).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "./profile") -> Iterator[None]:
    """Capture a TPU profiler trace viewable in TensorBoard/XProf:

        with profiling.trace("./profile"):
            state, _ = train_step(...)
            jax.block_until_ready(state)
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope  # annotate ops inside jitted code


class StepTimer:
    """Wall-clock step timing with warmup discard (the analogue of the
    reference's per-epoch/per-complex timers, `train.py:317`,
    `inference_rigid.py:241-245`)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
