"""Distance kernels for the TPU-native HNSW engine.

Reproduces the metric inventory of the reference's external ``anndists`` crate
(re-exported at reference ``src/lib.rs:18``, ``src/prelude.rs:11`` and used through the
``Distance<T>`` trait, reference ``src/hnsw.rs:30,952,1026``):

    L1, L2, Cosine, Dot (pre-normalized vectors), Hamming, Jaccard, Hellinger,
    Jeffreys, JensenShannon, Levenshtein (u16 strings), user-defined (DistPtr /
    DistCFFI analogs) and NoDist (graph-only reloads).

Design (TPU-first, not a port):
  * every metric has THREE entry points —
      - ``pair(a, b)``        : numpy scalar distance (host oracle / serial core)
      - ``batch(q, X)``       : numpy ``[B,d] x [N,d] -> [B,N]`` (brute-force oracle)
      - ``jnp_scores(q, C)``  : jax  ``[B,d] x [B,K,d] -> [B,K]`` — the form the
        batched beam-search kernel needs (per-query gathered candidates).
  * metrics whose score is an inner product (L2 via the norm trick, Dot, Cosine)
    additionally expose ``jnp_matmul_scores`` so layer-0 scoring can ride the MXU.
  * everything is static-shaped and jit-safe; masking of padded candidates is the
    caller's job (scores for padded slots are overwritten with +inf there).

Distances are only ever *compared*, so monotone-equivalent forms are allowed, but we
keep the conventional values so dumped link distances stay meaningful across the
reference's file format (reference ``src/hnswio.rs:1094`` dumps per-link f32 distances).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

try:  # jax is always present in this environment, but keep the host core importable
    import jax
    import jax.numpy as jnp

    HAVE_JAX = True
except Exception:  # pragma: no cover
    jnp = None
    HAVE_JAX = False

_EPS = 1e-10


# --------------------------------------------------------------------------- numpy ---

def _np_f(x):
    return np.asarray(x, dtype=np.float64)


def np_l1(q, X):
    return np.abs(_np_f(q)[..., None, :] - _np_f(X)[None, ...]).sum(-1) if q.ndim == 2 else np.abs(_np_f(q) - _np_f(X)).sum(-1)


def np_l2(q, X):
    d = _np_f(q)[..., None, :] - _np_f(X)[None, ...] if q.ndim == 2 else _np_f(q) - _np_f(X)
    return np.sqrt((d * d).sum(-1))


def np_dot(q, X):
    s = _np_f(q) @ _np_f(X).T if q.ndim == 2 else (_np_f(q) * _np_f(X)).sum(-1)
    return 1.0 - s


def np_cosine(q, X):
    qf, Xf = _np_f(q), _np_f(X)
    nq = np.linalg.norm(qf, axis=-1)
    nx = np.linalg.norm(Xf, axis=-1)
    if q.ndim == 2:
        s = qf @ Xf.T
        denom = nq[:, None] * nx[None, :]
    else:
        s = (qf * Xf).sum(-1)
        denom = nq * nx
    return 1.0 - np.where(denom > 0, s / np.maximum(denom, _EPS), 0.0)


def np_hamming(q, X):
    if q.ndim == 2:
        return (q[:, None, :] != X[None, :, :]).mean(-1).astype(np.float64)
    return (np.asarray(q) != np.asarray(X)).mean(-1).astype(np.float64)


def np_jaccard(q, X):
    qf, Xf = _np_f(q), _np_f(X)
    if q.ndim == 2:
        mn = np.minimum(qf[:, None, :], Xf[None, :, :]).sum(-1)
        mx = np.maximum(qf[:, None, :], Xf[None, :, :]).sum(-1)
    else:
        mn = np.minimum(qf, Xf).sum(-1)
        mx = np.maximum(qf, Xf).sum(-1)
    return 1.0 - np.where(mx > 0, mn / np.maximum(mx, _EPS), 0.0)


def np_hellinger(q, X):
    sq = np.sqrt(np.maximum(_np_f(q), 0.0))
    sx = np.sqrt(np.maximum(_np_f(X), 0.0))
    d = sq[..., None, :] - sx[None, ...] if q.ndim == 2 else sq - sx
    return np.sqrt(np.maximum(0.5 * (d * d).sum(-1), 0.0))


def np_jeffreys(q, X):
    qf = np.maximum(_np_f(q), _EPS)
    xf = np.maximum(_np_f(X), _EPS)
    if q.ndim == 2:
        diff = qf[:, None, :] - xf[None, :, :]
        lg = np.log(qf)[:, None, :] - np.log(xf)[None, :, :]
        return (diff * lg).sum(-1)
    return ((qf - xf) * (np.log(qf) - np.log(xf))).sum(-1)


def np_jensenshannon(q, X):
    qf = _np_f(q)
    xf = _np_f(X)
    if q.ndim == 2:
        qf = qf[:, None, :]
        xf = xf[None, :, :]
    m = 0.5 * (qf + xf)
    # xlogy-style: 0*log(0/m) = 0
    t1 = np.where(qf > 0, qf * (np.log(np.maximum(qf, _EPS)) - np.log(np.maximum(m, _EPS))), 0.0)
    t2 = np.where(xf > 0, xf * (np.log(np.maximum(xf, _EPS)) - np.log(np.maximum(m, _EPS))), 0.0)
    return np.sqrt(np.maximum(0.5 * (t1 + t2).sum(-1), 0.0))


def np_levenshtein_pair(a, b) -> float:
    """Edit distance on integer sequences (reference uses u16 code points,
    ``tests/filtertest.rs:59-65``). Trailing padding value ``0`` is stripped so the
    metric works on right-padded fixed-width arrays."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    a = a[a != 0] if a.size and (a == 0).any() else a
    b = b[b != 0] if b.size and (b == 0).any() else b
    la, lb = len(a), len(b)
    if la == 0:
        return float(lb)
    if lb == 0:
        return float(la)
    prev = np.arange(lb + 1, dtype=np.int64)
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        # rolling DP row; the min over insert must be a sequential scan
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        for j in range(1, lb + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev, cur = cur, prev
    return float(prev[lb])


def np_levenshtein(q, X):
    if q.ndim == 2:
        return np.array([[np_levenshtein_pair(a, b) for b in X] for a in q], dtype=np.float64)
    return np.array([np_levenshtein_pair(q, b) for b in X] if X.ndim == 2 else np_levenshtein_pair(q, X))


# ---------------------------------------------------------------------------- jax ----

def _jx(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def jnp_scores_l1(q, C):
    return jnp.abs(_jx(q)[:, None, :] - _jx(C)).sum(-1)


def jnp_scores_l2(q, C):
    d = _jx(q)[:, None, :] - _jx(C)
    return jnp.sqrt(jnp.maximum((d * d).sum(-1), 0.0))


def jnp_scores_dot(q, C):
    return 1.0 - jnp.einsum("bd,bkd->bk", _jx(q), _jx(C))


def jnp_scores_cosine(q, C):
    qf, cf = _jx(q), _jx(C)
    s = jnp.einsum("bd,bkd->bk", qf, cf)
    denom = jnp.linalg.norm(qf, axis=-1)[:, None] * jnp.linalg.norm(cf, axis=-1)
    return 1.0 - jnp.where(denom > 0, s / jnp.maximum(denom, _EPS), 0.0)


def jnp_scores_hamming(q, C):
    return (q[:, None, :] != C).mean(-1).astype(jnp.float32)


def jnp_scores_jaccard(q, C):
    qf, cf = _jx(q)[:, None, :], _jx(C)
    mn = jnp.minimum(qf, cf).sum(-1)
    mx = jnp.maximum(qf, cf).sum(-1)
    return 1.0 - jnp.where(mx > 0, mn / jnp.maximum(mx, _EPS), 0.0)


def jnp_scores_hellinger(q, C):
    d = jnp.sqrt(jnp.maximum(_jx(q), 0.0))[:, None, :] - jnp.sqrt(jnp.maximum(_jx(C), 0.0))
    return jnp.sqrt(jnp.maximum(0.5 * (d * d).sum(-1), 0.0))


def jnp_scores_jeffreys(q, C):
    qf = jnp.maximum(_jx(q), _EPS)[:, None, :]
    cf = jnp.maximum(_jx(C), _EPS)
    return ((qf - cf) * (jnp.log(qf) - jnp.log(cf))).sum(-1)


def jnp_scores_jensenshannon(q, C):
    qf = _jx(q)[:, None, :]
    cf = _jx(C)
    m = 0.5 * (qf + cf)
    t1 = jnp.where(qf > 0, qf * (jnp.log(jnp.maximum(qf, _EPS)) - jnp.log(jnp.maximum(m, _EPS))), 0.0)
    t2 = jnp.where(cf > 0, cf * (jnp.log(jnp.maximum(cf, _EPS)) - jnp.log(jnp.maximum(m, _EPS))), 0.0)
    return jnp.sqrt(jnp.maximum(0.5 * (t1 + t2).sum(-1), 0.0))


def jnp_scores_levenshtein(q, C):
    """Batched edit distance [B,d] x [B,K,d] -> [B,K] — the device form of
    ``np_levenshtein_pair`` (zero entries are padding and are stripped, same
    contract; reference uses u16 code points, ``tests/filtertest.rs:59-65``).

    The classic row DP carries a sequential inner loop
    ``cur[j] = min(t[j], cur[j-1] + 1)`` that cannot vectorize. Unrolling it
    gives ``cur[j] = min_{l<=j}(t[l] + (j - l)) = j + cummin(t[l] - l)[j]`` —
    a cumulative min, which XLA lowers as a parallel associative scan. The
    whole DP is then ``d`` ``lax.scan`` steps of elementwise [B,K,d] ops: no
    data-dependent control flow, static shapes, fully batched over queries and
    candidates. Variable effective lengths (la, lb) are handled by compacting
    nonzeros to the front and reading the DP grid at row la (captured inside
    the scan) and column lb (one final gather). Values stay exact in f32
    (distances are integers <= 2d)."""
    q = q.astype(jnp.float32)
    C = C.astype(jnp.float32)
    B, d = q.shape
    K = C.shape[1]

    def compact(x):  # nonzeros first, original order preserved (stable)
        order = jnp.argsort(x == 0, axis=-1, stable=True)
        return jnp.take_along_axis(x, order, axis=-1)

    A = compact(q)
    Cv = compact(C)
    la = (q != 0).sum(-1).astype(jnp.float32)  # [B]
    lb = (C != 0).sum(-1)  # [B,K] int
    ar = jnp.arange(d + 1, dtype=jnp.float32)
    prev0 = jnp.broadcast_to(ar, (B, K, d + 1))

    def step(carry, xi):
        prev, res = carry
        i, a_i = xi  # row index (1..d) and the query symbol A[:, i-1]
        sub = prev[..., :-1] + (Cv != a_i[:, None, None]).astype(jnp.float32)
        t = jnp.minimum(sub, prev[..., 1:] + 1.0)
        t_full = jnp.concatenate(
            [jnp.broadcast_to(i, (B, K, 1)), t], axis=-1)  # j=0 costs i
        cur = ar + jax.lax.cummin(t_full - ar, axis=2)
        res = jnp.where((i == la)[:, None, None], cur, res)
        return (cur, res), None

    (_, res), _ = jax.lax.scan(
        step, (prev0, prev0),
        (jnp.arange(1, d + 1, dtype=jnp.float32), A.T))
    return jnp.take_along_axis(res, lb[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]


# matmul (MXU) forms: score(q, X) over a full table, [B,d] x [N,d] -> [B,N] -------------

def jnp_matmul_scores_l2(q, X, x_sqnorms=None):
    qf, xf = _jx(q), _jx(X)
    if x_sqnorms is None:
        x_sqnorms = (xf * xf).sum(-1)
    sq = (qf * qf).sum(-1)
    g = qf @ xf.T
    return jnp.sqrt(jnp.maximum(sq[:, None] - 2.0 * g + x_sqnorms[None, :], 0.0))


def jnp_matmul_scores_dot(q, X, x_sqnorms=None):
    return 1.0 - _jx(q) @ _jx(X).T


def jnp_matmul_scores_cosine(q, X, x_sqnorms=None):
    qf, xf = _jx(q), _jx(X)
    nx = jnp.sqrt(x_sqnorms) if x_sqnorms is not None else jnp.linalg.norm(xf, axis=-1)
    nq = jnp.linalg.norm(qf, axis=-1)
    denom = nq[:, None] * nx[None, :]
    return 1.0 - jnp.where(denom > 0, (qf @ xf.T) / jnp.maximum(denom, _EPS), 0.0)


def jnp_matmul_scores_l1(q, X, x_sqnorms=None):
    return jnp.abs(_jx(q)[:, None, :] - _jx(X)[None, :, :]).sum(-1)


# ------------------------------------------------------------------------- registry ---

@dataclasses.dataclass(frozen=True)
class Metric:
    """One distance metric, in all the forms the engine needs."""

    name: str
    np_batch: Callable  # (q[d] or [B,d], X[N,d]) -> [N] / [B,N] float64
    jnp_scores: Optional[Callable] = None  # (q[B,d], C[B,K,d]) -> [B,K] f32
    jnp_matmul_scores: Optional[Callable] = None  # (q[B,d], X[N,d], sqnorms?) -> [B,N]
    needs_normalized: bool = False  # Dot assumes pre-L2-normalized inputs

    def pair(self, a, b) -> float:
        a = np.asarray(a)
        b = np.asarray(b)
        return float(self.np_batch(a, b[None, :])[0]) if b.ndim == 1 else float(self.np_batch(a, b))

    def brute_force(self, queries, X):
        """Exact [B,N] distance matrix on host (test oracle)."""
        q = np.asarray(queries)
        return self.np_batch(q if q.ndim == 2 else q[None, :], np.asarray(X))


# User metrics that carry a device kernel, by name. Device programs resolve
# metrics by NAME at trace time (the name is a hashable static jit arg; the
# callable is not), so a jnp-capable UserMetric registers itself here and
# ``get_metric`` falls back to this dict after the builtin table. One binding
# per name per process: jitted programs cache by name, so silently rebinding a
# name to a different function would serve stale traces — hence the conflict
# error below.
_USER_METRICS: dict = {}


class UserMetric(Metric):
    """Analog of the reference's ``DistPtr`` / ``DistCFFI`` (user-supplied distance,
    reference ``src/hnswio.rs:1483-1507``, ``src/libext.rs:643-655``): wraps an arbitrary
    Python pair function.

    Device tier: pass ``jnp_scores`` (a jax-traceable ``[B,d] x [B,K,d] -> [B,K]``
    scores fn) and the metric runs the full device insert/search paths —
    the TPU-native reading of the reference's ``DistPtr`` closures riding its
    ``parallel_insert``/``parallel_search`` thread pools (``src/hnsw.rs:1601-1635``).
    Optionally also ``jnp_matmul_scores`` (``[B,d] x [N,d] (+sqnorms) -> [B,N]``)
    to enable the MXU paths (exact-scan tier, pivot entry). Without ``jnp_scores``
    device modes fall back to host evaluation. Names must be unique per process
    when a device kernel is attached (compiled programs cache by name)."""

    def __init__(self, fn: Callable, name: str = "DistPtr",
                 jnp_scores: Optional[Callable] = None,
                 jnp_matmul_scores: Optional[Callable] = None):
        def batch(q, X):
            q = np.asarray(q)
            X = np.asarray(X)
            if q.ndim == 2:
                return np.array([[fn(a, b) for b in X] for a in q], dtype=np.float64)
            return np.array([fn(q, b) for b in X], dtype=np.float64)

        object.__setattr__(self, "name", name)
        object.__setattr__(self, "np_batch", batch)
        object.__setattr__(self, "jnp_scores", jnp_scores)
        object.__setattr__(self, "jnp_matmul_scores", jnp_matmul_scores)
        object.__setattr__(self, "needs_normalized", False)
        object.__setattr__(self, "_fn", fn)
        if jnp_scores is not None or jnp_matmul_scores is not None:
            if name in DISTANCES:
                raise ValueError(f"user metric name {name!r} shadows a builtin")
            prev = _USER_METRICS.get(name)
            if prev is not None and (prev.jnp_scores, prev.jnp_matmul_scores,
                                     prev._fn) != (jnp_scores,
                                                   jnp_matmul_scores, fn):
                raise ValueError(
                    f"user metric name {name!r} is already registered with a "
                    "different function; device programs cache compiled traces "
                    "by metric name — pick a unique name per metric")
            _USER_METRICS[name] = self


def _mk(name, np_batch, jnp_scores=None, jnp_matmul=None, needs_normalized=False):
    return Metric(name, np_batch, jnp_scores if HAVE_JAX else None,
                  jnp_matmul if HAVE_JAX else None, needs_normalized)


DISTANCES = {
    "L1": _mk("L1", np_l1, jnp_scores_l1, jnp_matmul_scores_l1),
    "L2": _mk("L2", np_l2, jnp_scores_l2, jnp_matmul_scores_l2),
    "Cosine": _mk("Cosine", np_cosine, jnp_scores_cosine, jnp_matmul_scores_cosine),
    "Dot": _mk("Dot", np_dot, jnp_scores_dot, jnp_matmul_scores_dot, needs_normalized=True),
    "Hamming": _mk("Hamming", np_hamming, jnp_scores_hamming),
    "Jaccard": _mk("Jaccard", np_jaccard, jnp_scores_jaccard),
    "Hellinger": _mk("Hellinger", np_hellinger, jnp_scores_hellinger),
    "Jeffreys": _mk("Jeffreys", np_jeffreys, jnp_scores_jeffreys),
    "JensenShannon": _mk("JensenShannon", np_jensenshannon, jnp_scores_jensenshannon),
    "Levenshtein": _mk("Levenshtein", np_levenshtein, jnp_scores_levenshtein),
    "NoDist": _mk("NoDist", lambda q, X: np.zeros(np.asarray(X).shape[:-1] if np.asarray(q).ndim == 1 else (np.asarray(q).shape[0], np.asarray(X).shape[0]))),
}

# canonical aliases matching the reference's struct names (DistL2 etc.)
for _n in list(DISTANCES):
    DISTANCES["Dist" + _n] = DISTANCES[_n]


def get_metric(dist) -> Metric:
    """Resolve a metric from a name (``"L2"``/``"DistL2"``), a ``Metric``, or a
    Python callable (user distance, DistPtr analog)."""
    if isinstance(dist, Metric):
        return dist
    if callable(dist):
        return UserMetric(dist)
    try:
        return DISTANCES[dist]
    except KeyError:
        pass
    try:
        return _USER_METRICS[dist]  # jnp-capable UserMetric, resolved by name
    except KeyError:
        raise ValueError(f"unknown distance {dist!r}; known: {sorted(set(DISTANCES))}") from None


def l2_normalize(x):
    """Helper matching the reference's re-exported ``l2_normalize``
    (used at reference ``tests/serpar.rs:79``, ``examples/utils/annhdf5.rs:208-211``)."""
    x = np.asarray(x, dtype=np.float32)
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, _EPS)
