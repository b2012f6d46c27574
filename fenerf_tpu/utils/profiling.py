"""Profiling & runtime stats (reference had none wired in — SURVEY.md §5).

- `trace(dir)`: context manager around jax.profiler for XLA/TPU traces
  (view with TensorBoard / xprof).
- `StatsCollector`: running mean/std/min/max per metric — the functional
  equivalent of the reference's vendored-but-unused training_stats
  (siren/torch_utils/training_stats.py); under SPMD there is nothing to
  all-reduce because jitted metrics are already global.
"""
from __future__ import annotations

import contextlib
import json
import math
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StatsCollector:
    def __init__(self):
        self._n = defaultdict(int)
        self._sum = defaultdict(float)
        self._sumsq = defaultdict(float)
        self._min = {}
        self._max = {}

    def report(self, **metrics: float) -> None:
        for k, v in metrics.items():
            v = float(v)
            self._n[k] += 1
            self._sum[k] += v
            self._sumsq[k] += v * v
            self._min[k] = min(self._min.get(k, v), v)
            self._max[k] = max(self._max.get(k, v), v)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for k, n in self._n.items():
            mean = self._sum[k] / n
            var = max(self._sumsq[k] / n - mean * mean, 0.0)
            out[k] = {"n": n, "mean": mean, "std": math.sqrt(var),
                      "min": self._min[k], "max": self._max[k]}
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)
