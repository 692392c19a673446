"""Tracing / profiling subsystem.

The reference has only ad-hoc wall-clock prints (reference
memory_2.py:328,356,585,669 and token-count scans :312-323).  This is a
structured replacement (SURVEY §5 'fresh design'):

  - Stopwatch: named, nestable wall-clock scopes with aggregated stats
    (count / total / mean / p50 / p95) and optional device sync so
    jitted-call timings are real;
  - trace(): context manager around jax.profiler for on-demand device
    traces;
  - Telemetry: structured counters (the reference's printed token counts
    become queryable metrics), dumped as one json blob per run.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


def _first_leaf(x):
    """First array leaf of a pytree-ish result (tuple/list/dict/array)."""
    if isinstance(x, (tuple, list)):
        for item in x:
            leaf = _first_leaf(item)
            if leaf is not None:
                return leaf
        return None
    if isinstance(x, dict):
        for item in x.values():
            leaf = _first_leaf(item)
            if leaf is not None:
                return leaf
        return None
    return x


class Stopwatch:
    """Named wall-clock scopes with aggregation.

        sw = Stopwatch(sync=True)
        with sw("ingest"):
            state, _ = build_step(...)
        print(sw.report())
    """

    def __init__(self, sync: bool = False):
        self.samples: Dict[str, List[float]] = defaultdict(list)
        self.sync = sync

    @contextlib.contextmanager
    def __call__(self, name: str):
        """sync=True: assign the computation's device output to
        `holder["result"]` inside the block -- syncing requires
        MATERIALIZING a value on this runtime (CLAUDE.md:
        block_until_ready/effects_barrier do not reliably await pure
        jitted work through the tunnel)."""
        t0 = time.perf_counter()
        holder: Dict[str, object] = {"result": None}
        try:
            yield holder
        finally:
            if self.sync and holder.get("result") is not None:
                try:
                    np.asarray(_first_leaf(holder["result"]))
                except Exception:       # noqa: BLE001
                    pass
            self.samples[name].append(time.perf_counter() - t0)

    def stats(self, name: str) -> Dict[str, float]:
        s = np.asarray(self.samples.get(name, []), float)
        if len(s) == 0:
            return {}
        return {
            "count": int(len(s)),
            "total_s": float(s.sum()),
            "mean_ms": float(s.mean() * 1e3),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p95_ms": float(np.percentile(s, 95) * 1e3),
        }

    def report(self) -> str:
        lines = []
        for name in sorted(self.samples):
            st = self.stats(name)
            lines.append(
                f"{name:<28} n={st['count']:<5} total={st['total_s']:.2f}s "
                f"mean={st['mean_ms']:.2f}ms p50={st['p50_ms']:.2f}ms "
                f"p95={st['p95_ms']:.2f}ms")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: self.stats(k) for k in self.samples}


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via the JAX profiler (view with tensorboard /
    xprof)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"jax trace written to {log_dir}")


class Telemetry:
    """Structured run counters + gauges (json-dumpable)."""

    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}

    def count(self, name: str, inc: float = 1.0) -> None:
        self.counters[name] += inc

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = float(value)

    def memory_stats(self, state) -> None:
        """Snapshot voxel-store occupancy (replaces the reference's HDF5
        token-count scan, memory_2.py:312-323)."""
        n = int(state.num_voxels)
        counts = np.asarray(state.feat_count)[:n]
        self.gauge("memory/num_voxels", n)
        self.gauge("memory/total_tokens", float(counts.sum()))
        self.gauge("memory/mean_tokens_per_voxel",
                   float(counts.mean()) if n else 0.0)
        self.gauge("memory/dropped_voxels", int(state.dropped_voxels))

    def dump(self, path: str, extra: Optional[Dict] = None) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"counters": dict(self.counters),
                       "gauges": self.gauges, **(extra or {})}, f, indent=2)
