"""Lightweight tracing/profiling: scoped wall-time spans + counters.

The reference ships no profiler; its examples hand-time build/search with
``cpu_time::ProcessTime`` around each phase (reference
``examples/ann-sift1m-128-euclidean.rs:100-158``). Here timing is a first-class
subsystem instead: the build driver, the navigability repair, the codec build,
and the serving stream's pipeline stages all report into one process-global
registry, so a user (or ``bench.py``) can ask WHERE a wall-clock second went
without instrumenting anything.

Zero overhead when disabled (the default): ``span`` returns a no-op context
manager, ``add`` returns immediately. Enable with ``HNSW_PROFILE=1`` in the
environment or ``enable_profiling()`` at runtime.

Usage::

    from hnsw_tpu.utils.profiling import enable_profiling, PROFILER
    enable_profiling()
    ... build / search ...
    PROFILER.report()
    # {'build.rounds': {'calls': 54, 'total_s': 212.7}, 'build.repair': ...,
    #  'stream.upload': ..., 'stream.dispatch': ..., 'stream.fetch': ...,
    #  'counters': {'stream.queries': 819200}}

Spans nest and are keyed by name only (flat registry): the call tree of this
library is shallow and a flat profile reads at a glance. Thread-safe via a
lock; the serving stream reports from its pipeline threads.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time


class Profiler:
    """Process-global span/counter registry (see module docstring)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._spans: dict[str, list] = {}  # name -> [calls, total_s]
        self._counters: dict[str, float] = {}
        self.enabled = os.environ.get("HNSW_PROFILE", "0") == "1"

    @contextlib.contextmanager
    def span(self, name: str):
        """Time a scope. No-op (and allocation-free) when disabled."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self._spans.setdefault(name, [0, 0.0])
                s[0] += 1
                s[1] += dt

    def add(self, name: str, value: float = 1.0):
        """Bump a counter (query counts, repair links, bytes moved...)."""
        if not self.enabled:
            return
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def report(self) -> dict:
        """Snapshot: {span: {calls, total_s}, ..., 'counters': {...}}."""
        with self._lock:
            out = {k: {"calls": v[0], "total_s": round(v[1], 4)}
                   for k, v in sorted(self._spans.items())}
            if self._counters:
                out["counters"] = dict(sorted(self._counters.items()))
            return out

    def reset(self):
        with self._lock:
            self._spans.clear()
            self._counters.clear()


PROFILER = Profiler()


def enable_profiling(on: bool = True):
    """Turn the global profiler on/off at runtime (HNSW_PROFILE=1 presets it)."""
    PROFILER.enabled = bool(on)


def profiling_report() -> dict:
    return PROFILER.report()
