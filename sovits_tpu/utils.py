"""Observability: profiling hooks + stage timers (SURVEY.md section 5.1).

The reference has almost no tracing (a dead timeit decorator and wall-clock
prints); here profiling is first-class: jax.profiler traces viewable in
TensorBoard/Perfetto, plus lightweight stage timers that land in the same
metrics stream as training scalars.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sovits_tpu_trace"):
    """Capture a jax.profiler trace (open in TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall-clock timers for pipeline stages.

    Replaces the reference's ad-hoc prints ("vits use time", epoch seconds)
    with a structured record; ``summary()`` returns mean/total per stage.
    """

    def __init__(self):
        self._acc = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self._acc[name] += dt
            self._count[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": self._acc[name],
                "count": self._count[name],
                "mean_s": self._acc[name] / max(self._count[name], 1),
            }
            for name in self._acc
        }

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))
