"""Device-tier user metrics (VERDICT r4 missing #2).

The reference pushes arbitrary ``DistPtr`` closures through its
``parallel_insert``/``parallel_search`` thread pools
(``src/hnsw.rs:1601-1635``, ``src/hnswio.rs:1483-1507``). The TPU cannot take
host callbacks inside a jitted program, so the TPU-native analog is a
``UserMetric`` carrying a jax-traceable ``jnp_scores`` expression: device
programs resolve metrics by NAME at trace time (a hashable static jit arg),
and jnp-capable user metrics register under their name so the full device
insert + search machinery runs them (``ops/distances.py:_USER_METRICS``).
"""
import numpy as np
import pytest

from hnsw_tpu import Hnsw, UserMetric
from hnsw_tpu.ops.distances import _USER_METRICS

# a non-builtin metric: coordinate-weighted squared L2 (weights rise with index)
_D = 16
_W = (1.0 + np.arange(_D, dtype=np.float32) / _D)


def _pair(a, b):
    diff = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float((_W * diff * diff).sum())


def _jnp_scores(q, C):
    import jax.numpy as jnp
    w = jnp.asarray(_W)
    diff = q[:, None, :].astype(jnp.float32) - C.astype(jnp.float32)
    return (w * diff * diff).sum(-1)


def _jnp_matmul(q, X, x_sqnorms=None):
    # weighted L2^2 via one MXU matmul: |a-b|^2_w = |a|^2_w - 2<a, w*b> + |b|^2_w
    import jax.numpy as jnp
    w = jnp.asarray(_W)
    qf = q.astype(jnp.float32)
    Xf = X.astype(jnp.float32)
    g = qf @ (w * Xf).T
    qsq = (w * qf * qf).sum(-1)[:, None]
    xsq = (w * Xf * Xf).sum(-1)[None, :]
    return jnp.maximum(qsq - 2.0 * g + xsq, 0.0)


def _metric():
    return UserMetric(_pair, name="WeightedL2Test", jnp_scores=_jnp_scores,
                      jnp_matmul_scores=_jnp_matmul)


def test_user_metric_device_build_and_search(rng):
    """Device-mode insert AND search with a jnp-capable UserMetric agree with
    a restricted fp64 brute-force oracle of the same metric."""
    n = 3000
    X = rng.random((n, _D)).astype(np.float32)
    m = _metric()
    h = Hnsw(max_nb_connection=12, max_elements=n, ef_construction=64, dist=m)
    h.parallel_insert((X, np.arange(n)), mode="device", batch_size=512)
    assert h.get_nb_point() == n

    Q = rng.random((16, _D)).astype(np.float32)
    ids, dists = h.search_batch(Q, knbn=5, ef=64)
    truth = np.array([[_pair(q, x) for x in X] for q in Q])
    hits = 0
    for b in range(len(Q)):
        kth = np.sort(truth[b])[4]
        for j in range(5):
            i = int(ids[b, j])
            assert i >= 0
            d64 = _pair(Q[b], X[h.get_origin_id(i)])
            hits += d64 <= kth * (1 + 1e-6) + 1e-12
    assert hits / (len(Q) * 5) >= 0.9
    # device distances must BE the user metric (not a fallback builtin)
    i0 = int(ids[0, 0])
    assert dists[0, 0] == pytest.approx(_pair(Q[0], X[h.get_origin_id(i0)]),
                                        rel=1e-4)


def test_user_metric_serial_matches_device(rng):
    """mode="device" with jnp_scores and mode="serial" (host np fold) build
    from the same insertion semantics: searches agree on distance multisets."""
    n = 600
    X = rng.random((n, _D)).astype(np.float32)
    m = _metric()
    hd = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist=m)
    hd.parallel_insert((X, np.arange(n)), mode="device", batch_size=256)
    hs = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist=m)
    hs.parallel_insert([(X[i], i) for i in range(n)], mode="serial")
    Q = rng.random((8, _D)).astype(np.float32)
    res_d = hd.parallel_search(Q, 5, 64, mode="device")
    res_s = hs.parallel_search(Q, 5, 64, mode="serial")
    agree = 0
    for rd, rs in zip(res_d, res_s):
        dd = sorted(round(r.distance, 3) for r in rd)
        ds = sorted(round(r.distance, 3) for r in rs)
        agree += dd == ds
    assert agree >= 6, (agree, res_d[0], res_s[0])


def test_bare_callable_stays_serial(rng):
    """A bare Python callable (no jnp_scores) must keep working through the
    serial fallback — the documented DistPtr analog."""
    n = 300
    X = rng.random((n, _D)).astype(np.float32)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48,
             dist=_pair)
    h.parallel_insert((X, np.arange(n)), mode="device", batch_size=128)
    res = h.parallel_search(X[:4], 1, 32, mode="device")  # silently serial
    assert all(r[0].d_id == i for i, r in enumerate(res))


def test_user_metric_name_conflict_raises():
    _metric()  # idempotent re-registration of the identical functions is fine
    _metric()
    with pytest.raises(ValueError, match="already registered"):
        UserMetric(_pair, name="WeightedL2Test",
                   jnp_scores=lambda q, C: _jnp_scores(q, C) * 2)
    with pytest.raises(ValueError, match="shadows a builtin"):
        UserMetric(_pair, name="L2", jnp_scores=_jnp_scores)
    assert "WeightedL2Test" in _USER_METRICS
