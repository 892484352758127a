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

    def __init__(self, dist="L2", dtype=np.float32):
        self.metric = get_metric(dist)
        self.dtype = np.dtype(dtype)
        self._X: Optional[np.ndarray] = None
        self._ids: Optional[np.ndarray] = None
        self._dev = None

    def __len__(self):
        return 0 if self._X is None else len(self._X)

    def insert(self, data, origin_id=None):
        if origin_id is None:
            data, origin_id = data
        v = np.asarray(data, self.dtype)[None, :]
        self._X = v if self._X is None else np.concatenate([self._X, v])
        i = np.array([origin_id], np.int64)
        self._ids = i if self._ids is None else np.concatenate([self._ids, i])
        self._dev = None

    def parallel_insert(self, data_with_ids, **kw):
        X = np.stack([np.asarray(v, self.dtype) for v, _ in data_with_ids])
        ids = np.array([int(i) for _, i in data_with_ids], np.int64)
        self._X = X if self._X is None else np.concatenate([self._X, X])
        self._ids = ids if self._ids is None else np.concatenate([self._ids, ids])
        self._dev = None

    def _device(self):
        if self._dev is None:
            Xd = jnp.asarray(self._X.astype(np.float32))
            self._dev = (Xd, (Xd * Xd).sum(-1))
        return self._dev

    def search_batch(self, queries, knbn: int, ef: int = 0, filter=None):
        if self._X is None:
            q = np.atleast_2d(queries)
            return (np.full((len(q), knbn), -1, np.int64),
                    np.full((len(q), knbn), np.inf, np.float32))
        q = np.atleast_2d(np.asarray(queries, np.float32))
        Xd, xsq = self._device()
        k = min(knbn, len(self._X))
        d, idx = _bf_topk(jnp.asarray(q), Xd, xsq, k, self.metric.name)
        d = np.array(d)
        idx = np.array(idx)
        ids = self._ids[idx]
        if filter is not None:
            from ..filter import filter_mask
            ok = filter_mask(filter, ids.reshape(-1)).reshape(ids.shape)
            d = np.where(ok, d, np.inf)
            order = np.argsort(d, axis=1)
            d = np.take_along_axis(d, order, 1)
            ids = np.take_along_axis(ids, order, 1)
            ids[~np.isfinite(d)] = -1
        if k < knbn:
            pad = knbn - k
            ids = np.concatenate([ids, np.full((len(q), pad), -1, np.int64)], 1)
            d = np.concatenate([d, np.full((len(q), pad), np.inf, np.float32)], 1)
        return ids, d

    def search(self, data, knbn: int, ef: int = 0, filter=None):
        from .hnsw import Neighbour
        ids, d = self.search_batch(np.asarray(data)[None, :], knbn, ef, filter)
        return [Neighbour(int(i), float(dd), (0, int(i)))
                for i, dd in zip(ids[0], d[0]) if i >= 0]
