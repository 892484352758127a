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
import time

_initialized = False


def init_logging(level: str | None = None) -> logging.Logger:
    """Idempotent global init (the reference uses lazy_static for the same)."""
    global _initialized
    logger = logging.getLogger("hnsw_tpu")
    if _initialized:
        return logger
    lvl = (level or os.environ.get("HNSW_TPU_LOG")
           or os.environ.get("RUST_LOG", "warning")).upper()
    lvl = {"TRACE": "DEBUG"}.get(lvl, lvl)
    handler = logging.StreamHandler()
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
