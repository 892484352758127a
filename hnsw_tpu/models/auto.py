"""Automatic engine selection: exact MXU scan vs HNSW graph traversal.

The reference library has exactly one engine (the HNSW graph). On TPU the
brute-force scan is a *product* path, not just a test oracle — a tiled bf16
matmul on the MXU with an exact f32 refine serves recall 1.0 at rates that
beat graph traversal in three measured regimes (one v5e chip):

  * small corpora: the whole scan costs less than a beam iteration's gathers
    (200k x 128d: scan ~14k QPS while HNSW needs ef sweeps to tune);
  * high dimension: graph gathers scale with d while the scan rides the MXU
    (70k x 784d mnist-analog: scan 14.3k @ 0.9994 vs HNSW 4.9k @ 0.982);
  * high recall targets: at 1M x 128d the scan serves 42k QPS at recall 1.0
    while the graph needs ef large enough to drop to ~27k at 0.989.

HNSW wins large-N / low-d at moderate recall (1M x 128d: ~50-60k @ 0.983) and
scales O(log N) per query where the scan is O(N).

``AutoIndex`` buffers inserts, picks the engine at build time from
(N, d, metric, recall_target), and delegates the full search surface. The
decision can be forced with ``engine="hnsw" | "scan"``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .brute import BruteForceIndex
from .hnsw import Hnsw
from .ivf import IvfFlatIndex, clusteredness
from ..ops.distances import get_metric


class AutoIndex:
    """Engine-selecting ANN index. API-compatible subset of ``Hnsw``.

    Selection rule (measured crossovers on v5e, see module docstring):

      * non-L2 metrics or tiny corpora (< ``SCAN_MIN``): whichever engine is
        structurally required (the Pallas scan path is L2; other metrics use
        the graph unless the corpus is small enough for the XLA matmul scan);
      * d >= ``HIGH_D``: exact scan (graph gathers scale with d);
      * clustered corpora (sampled k-means quantization gain >=
        ``IVF_CLUSTEREDNESS``, inner-product metrics): IVF-Flat — graph
        traversal is structurally weak there (flat recall-vs-ef curve,
        measured 0.85 ceiling at ef=512 on the clustered gate vs IVF 0.99);
      * recall_target >= 0.99 and N*d <= ``SCAN_BUDGET``: exact scan (recall
        1.0 at rates the graph cannot reach at that recall);
      * otherwise: HNSW graph.
    """

    SCAN_MIN = 32_768       # below this even non-L2 metrics scan exactly
    HIGH_D = 512            # measured: 70k x 784 scan 14.3k vs graph 4.9k
    SCAN_BUDGET = 5.0e8     # N*d where the 42k-QPS 1M x 128 scan sits at ~3.8e8
    # Clustered L2 scan->IVF handoff, from the measured 1M x 128 clustered
    # point (r5): scan 30.1k @ 0.9944 vs IVF 11.5k @ 0.982 / 5.4k @ 0.9923 —
    # the MXU full scan beats probing even at 1M. Scan cost is O(N*d) per
    # query while IVF's >=0.98 rate is ~flat in N (fixed nprobe/C fraction),
    # so the projected crossover is 30.1k/11.5k * 1M*128 ~ 3.4e8.
    IVF_BUDGET = 3.3e8
    IVF_CLUSTEREDNESS = 0.65  # sampled quantization gain; gauss-16 ~0.4,
    # the clustered gate ~0.8+ (see models/ivf.clusteredness)

    def __init__(self, dist="L2", recall_target: float = 0.98,
                 engine: Optional[str] = None, **hnsw_kwargs):
        if engine not in (None, "hnsw", "scan", "ivf"):
            raise ValueError(f"engine must be 'hnsw' | 'scan' | 'ivf' | None, "
                             f"got {engine!r}")
        self.metric = get_metric(dist)
        self.recall_target = float(recall_target)
        self._forced = engine
        self._hnsw_kwargs = dict(hnsw_kwargs)
        self._buf_v: list[np.ndarray] = []
        self._buf_id: list[int] = []
        self._engine = None  # built lazily

    # ------------------------------------------------------------- ingest ----
    def insert(self, data, origin_id=None):
        if origin_id is None:
            data, origin_id = data
        if self._engine is not None:
            self._engine.insert(data, origin_id)
            return
        self._buf_v.append(np.asarray(data, np.float32))
        self._buf_id.append(int(origin_id))

    def parallel_insert(self, data_with_ids, **kw):
        if self._engine is not None:
            self._engine.parallel_insert(data_with_ids, **kw)
            return
        for v, i in data_with_ids:
            self._buf_v.append(np.asarray(v, np.float32))
            self._buf_id.append(int(i))

    def __len__(self):
        return len(self._buf_v) if self._engine is None else len(self._engine)

    # -------------------------------------------------------------- build ----
    def choose_engine(self) -> str:
        """The selection rule, exposed for inspection/tests."""
        if self._forced:
            return self._forced
        n = len(self._buf_v)
        d = self._buf_v[0].shape[-1] if n else 0
        l2 = self.metric.name in ("L2", "DistL2")
        if n < self.SCAN_MIN:
            return "scan"
        if not l2:
            if self.metric.name in ("Dot", "DistDot", "Cosine", "DistCosine"):
                X = np.stack(self._buf_v[: 8192])
                if clusteredness(X) >= self.IVF_CLUSTEREDNESS:
                    return "ivf"  # graph is structurally weak on clustered
                    # and the Pallas scan tier is L2-only
            return "hnsw"  # large non-L2: the Pallas scan path is L2-only
        if d >= self.HIGH_D:
            return "scan"
        X = np.stack(self._buf_v[: 8192])
        if clusteredness(X) >= self.IVF_CLUSTEREDNESS:
            # Clustered L2 regime, measured at BOTH gates: exact scan beats
            # the graph (in-degree-guaranteed builds plateau ~0.97; pre-fix
            # 0.85 ceiling at ef=512 — structural) AND IVF (200k: 31.3k @
            # 0.9938 vs 10.4k @ 0.9856; 1M: 30.1k @ 0.9944 vs 11.5k @ 0.982).
            # IVF takes over only past IVF_BUDGET, where the scan's O(N*d)
            # per-query cost projects below IVF's ~N-flat probe rate.
            return "scan" if n * d <= self.IVF_BUDGET else "ivf"
        if self.recall_target >= 0.99 and n * d <= self.SCAN_BUDGET:
            return "scan"
        return "hnsw"

    def build(self):
        """Materialize the chosen engine from the buffered inserts."""
        if self._engine is not None:
            return self._engine
        kind = self.choose_engine()
        pairs = list(zip(self._buf_v, self._buf_id))
        if kind == "scan":
            eng = BruteForceIndex(dist=self.metric.name)
            if pairs:
                eng.parallel_insert(pairs)
        elif kind == "ivf":
            eng = IvfFlatIndex(dist=self.metric.name)
            if pairs:
                eng.parallel_insert(pairs)
            eng.build()
        else:
            n = max(len(pairs), 1)
            kw = dict(self._hnsw_kwargs)
            kw.setdefault("max_elements", n)
            eng = Hnsw(dist=self.metric.name, **kw)
            if pairs:
                eng.parallel_insert(pairs)
        self._engine = eng
        self._buf_v, self._buf_id = [], []
        return eng

    @property
    def engine(self):
        return self.build()

    @property
    def engine_name(self) -> str:
        eng = self.engine
        if isinstance(eng, BruteForceIndex):
            return "scan"
        return "ivf" if isinstance(eng, IvfFlatIndex) else "hnsw"

    # ------------------------------------------------------------- search ----
    def search(self, data, knbn: int, ef: int = 0, filter=None):
        eng = self.engine
        if isinstance(eng, Hnsw):
            return eng.search_possible_filter(data, knbn, ef, filter)
        return eng.search(data, knbn, ef, filter=filter)

    def search_batch(self, queries, knbn: int, ef: int = 0, filter=None):
        return self.engine.search_batch(queries, knbn, ef, filter=filter)

    def search_filter(self, data, knbn: int, ef: int, filter):
        return self.search(data, knbn, ef, filter=filter)

    def parallel_search(self, queries, knbn: int, ef: int = 0, filter=None,
                        mode: str = "auto"):
        eng = self.engine
        if isinstance(eng, Hnsw):
            return eng.parallel_search(queries, knbn, ef, filter=filter,
                                       mode=mode)
        return eng.parallel_search(queries, knbn, ef, filter=filter)

    def file_dump(self, path, basename: str) -> str:
        """Reference-format dump. Requires the graph engine (the exact scan
        keeps no graph to dump — force ``engine="hnsw"`` if persistence in the
        reference format is required; the raw vectors can always be saved with
        numpy)."""
        eng = self.engine
        if not isinstance(eng, Hnsw):
            raise ValueError("file_dump requires the hnsw engine; "
                             "construct AutoIndex(engine='hnsw') for "
                             "reference-format persistence")
        return eng.file_dump(path, basename)
