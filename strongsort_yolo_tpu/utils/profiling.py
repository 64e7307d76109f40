"""Tracing/profiling (SURVEY.md §5.1).

The reference's only observability is the on-frame FPS meter
(/root/reference/yolo_multi_model.py:320-328). This module adds:

- ``StageTimers``: named per-stage wall-clock accumulators
  (decode/infer/assoc/encode...) with summary stats;
- ``trace()``: context manager wrapping ``jax.profiler`` so a capture
  of the device timeline can be taken around any span and inspected
  with TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimers:
    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name in self.total:
            n = max(self.count[name], 1)
            out[name] = {
                "total_s": round(self.total[name], 4),
                "count": self.count[name],
                "mean_ms": round(self.total[name] / n * 1000, 3),
            }
        return out

    def report(self) -> str:
        rows = sorted(
            self.summary().items(), key=lambda kv: -kv[1]["total_s"]
        )
        return "\n".join(
            f"{name:>12}: {s['mean_ms']:8.3f} ms/it x {s['count']}"
            for name, s in rows
        )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/strongsort_yolo_tpu_trace"):
    """Capture a jax.profiler device trace around the enclosed span."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
