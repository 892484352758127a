"""Logging / observability.

Analog of the reference's global ``env_logger`` init (``src/lib.rs:20-30``), level
driven by ``RUST_LOG`` (reference ``Changes.md:52``): here ``HNSW_TPU_LOG`` (or
``RUST_LOG`` for habit) controls the package logger, initialized once. The insert
paths emit progress the way the reference prints every 50k inserts
(``src/hnsw.rs:524-526``).
"""

from __future__ import annotations

import logging
import os
import sys
import time

_initialized = False


class _DynStderrHandler(logging.StreamHandler):
    """StreamHandler that resolves ``sys.stderr`` at EMIT time. A plain
    StreamHandler captures the stderr object at init; long-lived processes
    that swap stderr per task (the TPU job worker tees it into each job's
    output file) otherwise keep logging into a stream that has since been
    closed ("I/O operation on closed file" spam from the logging module)."""

    def __init__(self):
        super().__init__(stream=sys.stderr)

    @property
    def stream(self):
        return sys.stderr

    @stream.setter
    def stream(self, value):  # base __init__/setStream assign it; ignore
        pass


def init_logging(level: str | None = None) -> logging.Logger:
    """Idempotent global init (the reference uses lazy_static for the same)."""
    global _initialized
    logger = logging.getLogger("hnsw_tpu")
    if _initialized:
        return logger
    lvl = (level or os.environ.get("HNSW_TPU_LOG")
           or os.environ.get("RUST_LOG", "warning")).upper()
    lvl = {"TRACE": "DEBUG"}.get(lvl, lvl)
    handler = _DynStderrHandler()
    handler.setFormatter(logging.Formatter(
        "[%(asctime)s %(levelname)s %(name)s] %(message)s", "%H:%M:%S"))
    logger.addHandler(handler)
    try:
        logger.setLevel(lvl)
    except ValueError:
        logger.setLevel(logging.WARNING)
    _initialized = True
    return logger


class ProgressTimer:
    """Wall + process-CPU timing, the shape of the reference's SystemTime +
    cpu_time::ProcessTime pairs in examples/tests (e.g.
    ``examples/ann-sift1m-128-euclidean.rs:91-113``)."""

    def __init__(self, label: str = ""):
        self.label = label
        self.wall0 = time.time()
        self.cpu0 = time.process_time()

    def elapsed(self) -> tuple[float, float]:
        return time.time() - self.wall0, time.process_time() - self.cpu0

    def report(self, logger=None) -> str:
        w, c = self.elapsed()
        msg = f"{self.label}: wall {w:.2f}s cpu {c:.2f}s"
        (logger or init_logging()).info(msg)
        return msg
