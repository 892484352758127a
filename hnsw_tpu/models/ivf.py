"""TPU-native IVF-Flat engine: MXU centroid routing + packed cluster slabs.

The reference library has one engine (the HNSW graph). Graph traversal is
structurally weak on heavily clustered / heavy-tailed corpora — measured on the
clustered bench gate, the reference's own insertion semantics score 0.39
recall@10 and the device HNSW build plateaus at ~0.85 even at ef=512 (the
recall-vs-ef curve is FLAT: missing neighbors are unreachable by beam
traversal, not under-explored). For that regime the right engine is inverted
lists — and IVF is a natural MXU program:

  * routing: ONE [B,d] x [C,d] matmul scores every query against every
    centroid; ``lax.top_k`` picks ``nprobe`` lists. No pointer chasing.
  * lists: the corpus is physically permuted CLUSTER-MAJOR into uniform
    ``cap``-row slabs, so a probed list is a contiguous block of rows — the
    per-query candidate fetch is a block gather of ``nprobe`` slabs, the
    pattern HBM likes best. A bf16 copy halves the streamed bytes; the exact
    f32 refine re-scores the top ``k + overfetch`` so returned distances are
    exact (same overfetch+refine contract as the Pallas scan tier).
  * balance: heavy-tailed cluster sizes (the clustered gate draws lognormal
    mixture weights) would make one slab huge and every probe pay for it;
    k-means lists are capped at ``balance`` x mean and overflow spills to the
    point's next-nearest centroid with space (measured on the 200k clustered
    gate: cap 1.25x keeps slab padding ~15% with recall parity at nprobe+1).

Complexity per query: O(C·d) routing + O(nprobe·cap·d) scoring, vs O(N·d) for
the exact scan — with C ~ sqrt(N) both terms are ~sqrt(N)·d.

Like ``BruteForceIndex`` this is an API-compatible subset of ``Hnsw``
(insert/parallel_insert/search/search_batch/parallel_search with filters);
``AutoIndex`` selects it for clustered corpora PAST the exact scan's O(N*d)
budget via a sampled quantization-gain statistic. Measured operating points
(one v5e, fp64-scored recall@10): 200k clustered gate — build 21.9s (vs 141s
graph), 0.9856 @ nprobe=32 (10.4k QPS sync); the exact scan still wins that
size (31.3k @ 0.9938), and on UNclustered gauss-16 corpora quantization is
weak (1M: 0.971 @ nprobe=64) — hence the routing rule. Reference context:
this engine has no analog in hnswlib-rs — it exists because the TPU cost
model (matmul ~ free, pointer chase ~ expensive) inverts the CPU tradeoff the
reference was designed around.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.distances import get_metric
from ..ops.beam_search import scores_gathered, scores_matmul

_IP_METRICS = ("L2", "DistL2", "Dot", "DistDot", "Cosine", "DistCosine")


@partial(jax.jit, static_argnames=("C",))
def _kmeans_assign(Xc, cent, csq, C: int):
    """One Lloyd chunk: nearest centroid + top-4 alternates + partial sums.

    Returns (assign[n], top4[n,4], psum[C,d], pcnt[C], qerr[n]) for a corpus
    chunk — the caller accumulates partial sums across chunks and updates
    centroids host-side (centroid update is O(C·d), not worth device round
    trips)."""
    d = scores_matmul("L2", Xc, cent, csq)  # [n, C]
    neg, top4 = lax.top_k(-d, min(4, C))
    assign = top4[:, 0]
    psum = jax.ops.segment_sum(Xc, assign, num_segments=C)
    pcnt = jax.ops.segment_sum(jnp.ones(Xc.shape[0], jnp.float32), assign,
                               num_segments=C)
    return assign, top4, psum, pcnt, -neg[:, 0]


def _kmeans(X: np.ndarray, C: int, iters: int, seed: int, chunk: int = 65536):
    """Chunked device k-means. Returns (centroids[C,d] f32, top4[n,4] i32)."""
    n, d = X.shape
    rng = np.random.default_rng(seed)
    cent = X[rng.permutation(n)[:C]].astype(np.float32)
    if len(cent) < C:  # corpus smaller than C: pad with jittered repeats
        extra = X[rng.integers(0, n, C - len(cent))] + rng.normal(
            0, 1e-3, (C - len(cent), d)).astype(np.float32)
        cent = np.concatenate([cent, extra.astype(np.float32)])
    Xd = [jnp.asarray(X[s:s + chunk].astype(np.float32))
          for s in range(0, n, chunk)]
    top4 = np.zeros((n, min(4, C)), np.int32)
    for it in range(iters):
        cd = jnp.asarray(cent)
        csq = (cd * cd).sum(-1)
        sums = np.zeros((C, d), np.float64)
        cnts = np.zeros(C, np.float64)
        ofs = 0
        for Xc in Xd:
            a, t4, ps, pc, _ = _kmeans_assign(Xc, cd, csq, C)
            if it == iters - 1:
                top4[ofs:ofs + Xc.shape[0]] = np.asarray(t4)
            sums += np.asarray(ps, np.float64)
            cnts += np.asarray(pc, np.float64)
            ofs += Xc.shape[0]
        dead = cnts == 0
        cnts[dead] = 1.0
        cent = (sums / cnts[:, None]).astype(np.float32)
        if dead.any():  # reseed dead centroids on random points
            cent[dead] = X[rng.integers(0, n, int(dead.sum()))]
    return cent, top4


def _median_cut(X: np.ndarray, idx: np.ndarray, cap: int):
    """Split one oversized cluster's members into <=``cap``-sized parts by
    recursive median cuts on the widest-variance axis. Each part stays a
    compact region of the cluster, so the part means make honest routing
    centroids — unlike spilling overflow points to OTHER clusters' lists,
    which strands them in slabs a query near their true cluster never probes
    (measured: a 1.25x cap with next-nearest spill cost 0.59 recall at
    nprobe=4 where splitting holds 0.95+)."""
    out = []
    stack = [idx]
    while stack:
        ids = stack.pop()
        if len(ids) <= cap:
            out.append(ids)
            continue
        V = X[ids]
        ax = int(V.var(axis=0).argmax())
        order = np.argsort(V[:, ax], kind="stable")
        half = len(ids) // 2
        stack.append(ids[order[:half]])
        stack.append(ids[order[half:]])
    return out


def _build_lists(X: np.ndarray, cent: np.ndarray, top1: np.ndarray, cap: int):
    """(routing centroid, member index array) per list: k-means clusters pass
    through when they fit; oversized ones split locally (``_median_cut``);
    empty ones are dropped."""
    lists = []
    order = np.argsort(top1, kind="stable")
    bounds = np.searchsorted(top1[order], np.arange(len(cent) + 1))
    for c in range(len(cent)):
        m = order[bounds[c]:bounds[c + 1]]
        if len(m) == 0:
            continue
        if len(m) <= cap:
            lists.append((cent[c], m))
        else:
            for part in _median_cut(X, m, cap):
                lists.append((X[part].mean(axis=0), part))
    return lists


@partial(jax.jit, static_argnames=("kf", "metric"))
def _ivf_probe(q, cent, csq, Xpk3, xsq3, pcT, kf: int, metric: str):
    """Route + score + first-stage top-k for one query chunk.

    ``lax.scan`` over the ``nprobe`` probes; each step gathers one WHOLE slab
    per query (``Xpk3[lists]`` with ``Xpk3 [L, cap, d]`` — a contiguous
    ``cap*d`` block per DMA, vs the 256-byte row-granular gathers that cap the
    beam kernel at ~20-28 GB/s) and folds its scores into a running top-``kf``
    merge. Peak live memory is one ``[B, cap, d]`` slab batch, independent of
    nprobe — the naive ``[B, nprobe*cap, d]`` materialization is 21 GB at the
    1M operating point.

    ``pcT``: [nprobe, B] probed list per step (from ``_ivf_route``)."""
    qf = q.astype(jnp.float32)
    B = q.shape[0]
    cap = Xpk3.shape[1]
    init = (jnp.full((B, kf), jnp.inf, jnp.float32),
            jnp.full((B, kf), -1, jnp.int32))

    def step(carry, lists):
        vals, rows = carry
        slab = Xpk3[lists]                       # [B, cap, d] block gather
        ssq = xsq3[lists]                        # [B, cap]
        d = scores_gathered(metric, qf, slab, ssq)   # [B, cap]
        # padding rows carry the xsq=inf sentinel; only the L2 form consults
        # xsq, so under Dot/Cosine a zero pad row would score a finite 1.0 and
        # could out-rank real negative-similarity candidates — mask explicitly
        d = jnp.where(jnp.isinf(ssq), jnp.inf, d)
        rid = (lists[:, None] * cap
               + jnp.arange(cap, dtype=jnp.int32)[None, :])
        neg, idx = lax.top_k(-jnp.concatenate([vals, d], 1), kf)
        rows = jnp.take_along_axis(jnp.concatenate([rows, rid], 1), idx, 1)
        return (-neg, rows), None

    (vals, rows), _ = lax.scan(step, init, pcT)
    return rows, vals


@partial(jax.jit, static_argnames=("nprobe", "metric"))
def _ivf_route(q, cent, csq, nprobe: int, metric: str):
    """[B,d] x [C,d] routing matmul -> top-``nprobe`` list ids, [nprobe, B]."""
    cs = scores_matmul(metric, q.astype(jnp.float32), cent, csq)  # [B, C]
    _, pc = lax.top_k(-cs, nprobe)
    return pc.T


@partial(jax.jit, static_argnames=("metric",))
def _exact_refine(q, Xf3, xsq3, rows, metric: str):
    """Re-score candidate packed rows against the exact f32 slabs (row-granular
    gather is fine here: only ``kf`` rows per query survive the probe)."""
    L, cap, d = Xf3.shape
    Xf = Xf3.reshape(L * cap, d)
    xsqf = xsq3.reshape(L * cap)
    safe = jnp.clip(rows, 0, L * cap - 1)
    dd = scores_gathered(metric, q.astype(jnp.float32), Xf[safe], xsqf[safe])
    # rows<0: unfilled top-k slots; xsq=inf sentinel: slab padding rows (the
    # sentinel only reaches Dot/Cosine distances through this mask)
    dd = jnp.where((rows >= 0) & ~jnp.isinf(xsqf[safe]), dd, jnp.inf)
    o = jnp.argsort(dd, axis=1)
    return (jnp.take_along_axis(rows, o, axis=1),
            jnp.take_along_axis(dd, o, axis=1))


class IvfFlatIndex:
    """Inverted-file flat index (see module docstring). API-compatible subset
    of ``Hnsw``; inner-product metric family (L2/Dot/Cosine)."""

    SCAN_DTYPE: Optional[str] = "bfloat16"  # probe-stage stream precision
    OVERFETCH = 8  # first-stage keep = k + OVERFETCH rounded up to 32
    KMEANS_ITERS = 8
    BALANCE = 1.25  # list cap = BALANCE * mean size, rounded up to 8

    def __init__(self, dist="L2", n_clusters: Optional[int] = None,
                 nprobe: int = 8, dtype=np.float32, seed: int = 0x1BF):
        self.metric = get_metric(dist)
        if self.metric.name not in _IP_METRICS:
            raise ValueError(f"IvfFlatIndex supports {_IP_METRICS}, "
                             f"got {self.metric.name}")
        self.dtype = np.dtype(dtype)
        self.n_clusters = n_clusters
        self.nprobe = int(nprobe)
        self.seed = int(seed)
        self._X: Optional[np.ndarray] = None
        self._ids: Optional[np.ndarray] = None
        self._built = None  # (cent, csq, Xpk_scan, Xpk_f32, xsq, row2idx, cap)

    def __len__(self):
        return 0 if self._X is None else len(self._X)

    # ------------------------------------------------------------- ingest ----
    def insert(self, data, origin_id=None):
        if origin_id is None:
            data, origin_id = data
        v = np.asarray(data, np.float32)[None, :]
        self._X = v if self._X is None else np.concatenate([self._X, v])
        i = np.array([origin_id], np.int64)
        self._ids = i if self._ids is None else np.concatenate([self._ids, i])
        self._built = None

    def parallel_insert(self, data_with_ids, **kw):
        if isinstance(data_with_ids, np.ndarray):
            X = data_with_ids.astype(np.float32)
            ids = np.arange(len(X), dtype=np.int64)
        elif (isinstance(data_with_ids, tuple) and len(data_with_ids) == 2
              and isinstance(data_with_ids[0], np.ndarray)):
            X = data_with_ids[0].astype(np.float32)
            ids = np.asarray(data_with_ids[1], np.int64)
        else:
            X = np.stack([np.asarray(v, np.float32) for v, _ in data_with_ids])
            ids = np.array([int(i) for _, i in data_with_ids], np.int64)
        self._X = X if self._X is None else np.concatenate([self._X, X])
        self._ids = ids if self._ids is None else np.concatenate([self._ids, ids])
        self._built = None

    # -------------------------------------------------------------- build ----
    def build(self):
        """k-means + balanced packing into uniform cluster slabs."""
        if self._built is not None:
            return
        from ..utils.profiling import PROFILER
        with PROFILER.span("ivf.build"):
            self._build()

    def _build(self):
        n, d = self._X.shape
        C = self.n_clusters or int(np.clip(2 * np.sqrt(n), 16, 4096))
        C = min(C, n)
        X = self._X.astype(np.float32)
        if self.metric.needs_normalized:  # Dot: reference l2-normalizes inserts
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        cent, top4 = _kmeans(X, C, self.KMEANS_ITERS, self.seed)
        cap = int(np.ceil(self.BALANCE * n / C))
        cap = max(8, -(-cap // 8) * 8)
        lists = _build_lists(X, cent, top4[:, 0], cap)
        L = len(lists)
        cent = np.stack([c for c, _ in lists]).astype(np.float32)
        # list-major packed layout; padding rows get +inf sqnorm
        row2idx = np.full(L * cap, -1, np.int64)  # packed row -> corpus index
        Xpk = np.zeros((L * cap, d), np.float32)
        for c, (_, m) in enumerate(lists):
            row2idx[c * cap:c * cap + len(m)] = m
            Xpk[c * cap:c * cap + len(m)] = X[m]
        xsq = np.where(row2idx >= 0, (Xpk * Xpk).sum(-1), np.inf).astype(np.float32)
        cd = jnp.asarray(cent)
        Xf3 = jnp.asarray(Xpk).reshape(L, cap, d)  # slab-major [L, cap, d]
        Xs3 = Xf3 if self.SCAN_DTYPE is None else Xf3.astype(self.SCAN_DTYPE)
        self._built = (cd, (cd * cd).sum(-1), Xs3, Xf3,
                       jnp.asarray(xsq).reshape(L, cap), row2idx, cap)

    @property
    def n_lists(self) -> int:
        self.build()
        return int(self._built[0].shape[0])

    # ------------------------------------------------------------- search ----
    def search_batch(self, queries, knbn: int, ef: int = 0, filter=None,
                     nprobe: Optional[int] = None, chunk: int = 512):
        """Batched search. ``nprobe`` overrides the instance default; ``ef``
        is accepted for facade compatibility and, when larger than
        nprobe*cap's candidate count would allow, widens nprobe so callers
        tuning ``ef`` like on the graph engine get the analogous knob."""
        if self._X is None:
            q = np.atleast_2d(queries)
            return (np.full((len(q), knbn), -1, np.int64),
                    np.full((len(q), knbn), np.inf, np.float32))
        self.build()
        cent, csq, Xs, Xf, xsq, row2idx, cap = self._built
        C = cent.shape[0]
        np_eff = int(nprobe or self.nprobe)
        if ef:  # ef ~ candidate budget: match nprobe to it
            np_eff = max(np_eff, -(-int(ef) // cap))
        np_eff = min(np_eff, C)
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric.needs_normalized:
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        k = min(knbn, len(self._X))
        # overfetch for bf16 rank noise; widen further under a filter
        kf = k + self.OVERFETCH if filter is None else 4 * k + self.OVERFETCH
        kf = min(-(-kf // 32) * 32, np_eff * cap)
        out_i = np.empty((len(q), kf), np.int64)
        out_d = np.empty((len(q), kf), np.float32)
        mname = self.metric.name
        for s in range(0, len(q), chunk):
            qs = jnp.asarray(q[s:s + chunk])
            pcT = _ivf_route(qs, cent, csq, np_eff, mname)
            rows, _ = _ivf_probe(qs, cent, csq, Xs, xsq, pcT, kf, mname)
            rows, dd = _exact_refine(qs, Xf, xsq, rows, mname)
            rn = np.asarray(rows)
            out_i[s:s + chunk] = np.where(rn >= 0, row2idx[rn], -1)
            out_d[s:s + chunk] = np.asarray(dd)
        ids = np.where(out_i >= 0, self._ids[np.clip(out_i, 0, len(self._ids) - 1)], -1)
        d = np.where(out_i >= 0, out_d, np.inf)
        if filter is not None:
            from ..filter import filter_mask
            ok = filter_mask(filter, ids.reshape(-1)).reshape(ids.shape)
            d = np.where(ok & (ids >= 0), d, np.inf)
            order = np.argsort(d, axis=1, kind="stable")
            d = np.take_along_axis(d, order, 1)
            ids = np.take_along_axis(ids, order, 1)
            ids[~np.isfinite(d)] = -1
        ids, d = ids[:, :knbn], d[:, :knbn]
        if ids.shape[1] < knbn:
            pad = knbn - ids.shape[1]
            ids = np.concatenate([ids, np.full((len(q), pad), -1, np.int64)], 1)
            d = np.concatenate([d, np.full((len(q), pad), np.inf, np.float32)], 1)
        return ids, d

    def search_stream(self, queries, knbn: int, nprobe: Optional[int] = None,
                      batch: int = 8192, query_dtype="float16"):
        """Pipelined batched search: upload / probe+refine dispatch / fetch on
        three threads (``ops.stream.pipelined_stream``), f16 query ingest by
        default — same serving contract as ``device_search_stream`` and the
        scan stream (the axon tunnel moves ~22 MB/s; f16 halves the ingest
        bytes; device math is f32 either way since ``_ivf_probe`` casts).

        Returns ``(ids[nq, knbn] int64, dists[nq, knbn] f32)``.
        """
        self.build()
        cent, csq, Xs, Xf, xsq, row2idx, cap = self._built
        C = cent.shape[0]
        np_eff = min(int(nprobe or self.nprobe), C)
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric.needs_normalized:
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        nq = len(q)
        k = min(knbn, len(self._X))
        kf = min(-(-(k + self.OVERFETCH) // 32) * 32, np_eff * cap)
        out_i = np.full((nq, knbn), -1, np.int64)
        out_d = np.full((nq, knbn), np.inf, np.float32)
        qd = np.dtype(query_dtype) if query_dtype else np.float32
        mname = self.metric.name

        from ..ops.stream import pipelined_stream

        def upload(s):
            return jnp.asarray(q[s:s + batch].astype(qd))

        def dispatch(s, qs):
            pcT = _ivf_route(qs, cent, csq, np_eff, mname)
            rows, _ = _ivf_probe(qs, cent, csq, Xs, xsq, pcT, kf, mname)
            return _exact_refine(qs, Xf, xsq, rows, mname)

        def fetch(s, out):
            rows, dd = out
            rn = np.asarray(rows)[:, :k]
            ii = np.where(rn >= 0, row2idx[rn], -1)
            out_i[s:s + batch, :k] = np.where(
                ii >= 0, self._ids[np.clip(ii, 0, len(self._ids) - 1)], -1)
            out_d[s:s + batch, :k] = np.where(
                ii >= 0, np.asarray(dd)[:, :k], np.inf)

        pipelined_stream(range(0, nq, batch), upload, dispatch, fetch)
        return out_i, out_d

    def search(self, data, knbn: int, ef: int = 0, filter=None):
        from .hnsw import Neighbour
        ids, d = self.search_batch(np.asarray(data)[None, :], knbn, ef, filter)
        return [Neighbour(int(i), float(dd), (0, int(i)))
                for i, dd in zip(ids[0], d[0]) if i >= 0]

    def parallel_search(self, queries, knbn: int, ef: int = 0, filter=None,
                        mode: str = "auto"):
        from .hnsw import Neighbour
        ids, d = self.search_batch(queries, knbn, ef, filter)
        return [[Neighbour(int(i), float(dd), (0, int(i)))
                 for i, dd in zip(ids[b], d[b]) if i >= 0]
                for b in range(len(ids))]

    # -------------------------------------------------------- persistence ----
    def save_native(self, path: str):
        """npz snapshot (same family as Hnsw.save_native): raw vectors + ids +
        build params; the packed layout is rebuilt deterministically on load
        (seeded k-means), keeping the file small and the format simple."""
        np.savez_compressed(path, kind="ivf-flat", X=self._X, ids=self._ids,
                            dist=self.metric.name, seed=self.seed,
                            nprobe=self.nprobe,
                            n_clusters=self.n_clusters or 0)

    @classmethod
    def load_native(cls, path: str) -> "IvfFlatIndex":
        z = np.load(path, allow_pickle=False)
        if str(z.get("kind", "")) != "ivf-flat":
            raise ValueError(f"{path} is not an ivf-flat snapshot")
        ix = cls(dist=str(z["dist"]), seed=int(z["seed"]),
                 nprobe=int(z["nprobe"]),
                 n_clusters=int(z["n_clusters"]) or None)
        ix._X = z["X"]
        ix._ids = z["ids"]
        return ix


def clusteredness(X: np.ndarray, sample: int = 8192, C: int = 64,
                  seed: int = 7) -> float:
    """Quantization gain of a small k-means over a sample: 1 - E||x-c||^2 /
    E||x-mu||^2. ~0 for isotropic gaussians, -> 1 for tight clusters. Used by
    ``AutoIndex`` to route clustered corpora to the IVF engine."""
    rng = np.random.default_rng(seed)
    S = X[rng.permutation(len(X))[:sample]].astype(np.float32)
    cent, top = _kmeans(S, min(C, len(S)), 4, seed, chunk=len(S))
    qe = float(np.mean(np.sum((S - cent[top[:, 0]]) ** 2, -1)))
    tot = float(np.mean(np.sum((S - S.mean(0)) ** 2, -1)))
    return 1.0 - qe / max(tot, 1e-30)
