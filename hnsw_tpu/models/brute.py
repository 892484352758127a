"""Exact k-NN by brute force on the MXU.

The reference's test harness computes exact neighbors with a skip list over all points
(``tests/serpar.rs:42-70``); on TPU the same oracle is a tiled matmul + top-k at
hundreds of GFLOP/s, so it doubles as a *product* path for small corpora or
recall-critical use (exact search can beat graph search below ~1M points on this
hardware). Supports the inner-product family (L2/Dot/Cosine) on the MXU and the
remaining metrics through the elementwise batch kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.distances import get_metric


@partial(jax.jit, static_argnames=("k", "metric"))
def _bf_topk(q, X, xsq, k: int, metric: str):
    m = get_metric(metric)
    if m.jnp_matmul_scores is not None:
        d = m.jnp_matmul_scores(q, X, xsq)
    else:
        d = m.jnp_scores(q, jnp.broadcast_to(X[None], (q.shape[0],) + X.shape))
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


class BruteForceIndex:
    """Exact nearest-neighbor index (flat). API-compatible subset of ``Hnsw``."""

    # Above this size the L2 path switches from the one-shot XLA matmul (which
    # materializes the [B, N] distance matrix) to the tiled Pallas scan kernel
    # (VMEM-resident tiles + overfetch/refine; 20.9k QPS @ 1M x 128 at recall
    # 1.0000 on one v5e chip). CPU backends keep the matmul (the Pallas
    # interpreter is test-only).
    PALLAS_MIN_POINTS = 32_768

    # Streaming-stage precision for the Pallas scan. "bfloat16" runs the
    # per-tile matmul with bf16 inputs / f32 accumulation (the MXU's native
    # rate, ~8x the f32 issue rate, and half the HBM stream) and keeps a
    # separate bf16 corpus copy on device; the refine stage always re-scores
    # finalists against the f32 corpus in the direct |q-x|^2 form, so the
    # returned distances stay exact. SCAN_OVERFETCH widens the first-stage
    # keep (k + overfetch, rounded to 32) so bf16 rank noise near the cut
    # cannot drop a true neighbor before the refine sees it. Measured at
    # 1M x 128 on v5e: of=8 and of=24 both score fp64 recall 1.0000, and
    # of=24 widens the top_k past 32 which costs ~20% QPS (17.6k vs 14.1k)
    # — so 8 is the default.
    SCAN_DTYPE: Optional[str] = "bfloat16"
    SCAN_OVERFETCH = 8

    def __init__(self, dist="L2", dtype=np.float32):
        self.metric = get_metric(dist)
        self.dtype = np.dtype(dtype)
        self._X: Optional[np.ndarray] = None
        self._ids: Optional[np.ndarray] = None
        self._dev = None
        self._dev_pallas = None

    def __len__(self):
        return 0 if self._X is None else len(self._X)

    def insert(self, data, origin_id=None):
        if origin_id is None:
            data, origin_id = data
        v = np.asarray(data, self.dtype)[None, :]
        self._X = v if self._X is None else np.concatenate([self._X, v])
        i = np.array([origin_id], np.int64)
        self._ids = i if self._ids is None else np.concatenate([self._ids, i])
        self._dev = self._dev_pallas = None

    def parallel_insert(self, data_with_ids, **kw):
        X = np.stack([np.asarray(v, self.dtype) for v, _ in data_with_ids])
        ids = np.array([int(i) for _, i in data_with_ids], np.int64)
        self._X = X if self._X is None else np.concatenate([self._X, X])
        self._ids = ids if self._ids is None else np.concatenate([self._ids, ids])
        self._dev = self._dev_pallas = None

    def _device(self):
        if self._dev is None:
            Xd = jnp.asarray(self._X.astype(np.float32))
            self._dev = (Xd, (Xd * Xd).sum(-1))
        return self._dev

    def _use_pallas(self) -> bool:
        if (self.metric.name not in ("L2", "DistL2")
                or self._X is None or len(self._X) < self.PALLAS_MIN_POINTS):
            return False
        try:
            return jax.default_backend() != "cpu"
        except Exception:
            return False

    def _pallas_device(self):
        if self._dev_pallas is None:
            from ..ops.pallas_topk import pad_corpus, pick_tn
            tn = pick_tn(self._X.shape[1])
            # shuffled row order (perm maps kernel row -> our row): the scan's
            # per-(block, lane) keep-2 cells collide when ids correlate with
            # geometry (cluster-ordered ingestion) — see pad_corpus
            Xp, xsq, perm = pad_corpus(self._X.astype(np.float32), tn=tn)
            Xd = jnp.asarray(Xp)
            Xscan = None if self.SCAN_DTYPE is None else Xd.astype(self.SCAN_DTYPE)
            self._dev_pallas = (Xd, jnp.asarray(xsq), tn, Xscan, perm)
        return self._dev_pallas

    def search_batch(self, queries, knbn: int, ef: int = 0, filter=None):
        if self._X is None:
            q = np.atleast_2d(queries)
            return (np.full((len(q), knbn), -1, np.int64),
                    np.full((len(q), knbn), np.inf, np.float32))
        q = np.atleast_2d(np.asarray(queries, np.float32))
        k = min(knbn, len(self._X))
        if self._use_pallas():
            from ..ops.pallas_topk import pallas_l2_topk_stream
            Xd, xsq, tn, Xscan, perm = self._pallas_device()
            # a filter post-masks the fetched candidates: overfetch so the
            # filtered answer still holds k survivors at moderate selectivity
            kf = k if filter is None else min(len(self._X),
                                              ((4 * k + 63) // 32) * 32)
            # In-kernel tile accumulation (running min1/min2 per lane-group
            # across `acc` consecutive tiles): shrinks the cross-tile HBM
            # candidate buffer — the scan's dominant traffic at 1M — by acc.
            # Target ~8 output blocks regardless of N: the [blocks, B, 2G]
            # int32 output stays FULLY VMEM-resident (Mosaic doesn't window
            # the revisited accumulation block — measured 64 MB stack alloc at
            # 16 blocks x B=4096, over the cap), so blocks x B bounds B; 8
            # blocks = 32 MB at B=4096 and a ~2k-lane final top_k (under the
            # width cliff). Miss probability stays negligible: >=3 true top-k
            # ids must collide in one of blocks*G ~ 1024 (block, lane) cells —
            # P ~ 1e-4 per query, absorbed by overfetch+refine.
            n_tiles = -(-Xd.shape[0] // tn)
            acc = max(1, -(-n_tiles // 8))
            # pipelined stream (uploads overlap compute); B=2048 at 8 blocks
            # is the VMEM-safe operating point (the [blocks, B, 2G] int32
            # accumulator plus the [B, tn] score temps must fit the 64 MB
            # scoped budget: 36 MB here; B=4096 measured 72-80 MB — OOM), and
            # the kernel is per-element VPU-bound so larger B buys nothing —
            # measured 42k QPS at 1M x 128 on one v5e
            d, idx = pallas_l2_topk_stream(
                q, Xd, xsq, kf, tn=tn, group=tn // 128, Xscan=Xscan,
                overfetch=self.SCAN_OVERFETCH, acc=acc,
                batch=min(2048, max(256, len(q))))
            d = d[:, :kf]
            idx = perm[np.clip(idx[:, :kf], 0, len(perm) - 1)]
        else:
            Xd, xsq = self._device()
            dj, ij = _bf_topk(jnp.asarray(q), Xd, xsq, k, self.metric.name)
            d = np.array(dj)
            idx = np.array(ij)
        ids = self._ids[idx]
        if filter is not None:
            from ..filter import filter_mask
            ok = filter_mask(filter, ids.reshape(-1)).reshape(ids.shape)
            d = np.where(ok, d, np.inf)
            order = np.argsort(d, axis=1)
            d = np.take_along_axis(d, order, 1)
            ids = np.take_along_axis(ids, order, 1)
            ids[~np.isfinite(d)] = -1
        ids = ids[:, :knbn]
        d = d[:, :knbn]
        if ids.shape[1] < knbn:
            pad = knbn - ids.shape[1]
            ids = np.concatenate([ids, np.full((len(q), pad), -1, np.int64)], 1)
            d = np.concatenate([d, np.full((len(q), pad), np.inf, np.float32)], 1)
        return ids, d

    def search(self, data, knbn: int, ef: int = 0, filter=None):
        from .hnsw import Neighbour
        ids, d = self.search_batch(np.asarray(data)[None, :], knbn, ef, filter)
        return [Neighbour(int(i), float(dd), (0, int(i)))
                for i, dd in zip(ids[0], d[0]) if i >= 0]

    def parallel_search(self, queries, knbn: int, ef: int = 0, filter=None,
                        mode: str = "auto"):
        """AnnT-style batched search returning list-of-Neighbour rows (order
        preserved, like reference ``parallel_search``, src/hnsw.rs:1601-1635)."""
        from .hnsw import Neighbour
        ids, d = self.search_batch(queries, knbn, ef, filter)
        return [[Neighbour(int(i), float(dd), (0, int(i)))
                 for i, dd in zip(ids[b], d[b]) if i >= 0]
                for b in range(len(ids))]
