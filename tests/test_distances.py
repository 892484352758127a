"""Distance kernels vs independent oracles (reference metric inventory SURVEY.md §2.9)."""

import numpy as np
import pytest

from hnsw_tpu.ops import distances as D


def _pairs(rng, n=16, d=24, positive=False):
    a = rng.random((n, d)) if positive else rng.standard_normal((n, d))
    b = rng.random((n, d)) if positive else rng.standard_normal((n, d))
    return a.astype(np.float32), b.astype(np.float32)


def test_l1_l2(rng):
    a, b = _pairs(rng)
    m1, m2 = D.get_metric("L1"), D.get_metric("DistL2")
    for x, y in zip(a, b):
        assert m1.pair(x, y) == pytest.approx(np.abs(x - y).sum(), rel=1e-5)
        assert m2.pair(x, y) == pytest.approx(np.linalg.norm(x - y), rel=1e-5)


def test_cosine_dot(rng):
    a, b = _pairs(rng)
    a = D.l2_normalize(a)
    b = D.l2_normalize(b)
    mc, md = D.get_metric("Cosine"), D.get_metric("Dot")
    for x, y in zip(a, b):
        expect = 1 - float(x @ y)
        assert mc.pair(x, y) == pytest.approx(expect, abs=1e-5)
        assert md.pair(x, y) == pytest.approx(expect, abs=1e-5)


def test_probability_metrics(rng):
    a, b = _pairs(rng, positive=True)
    a = a / a.sum(-1, keepdims=True)
    b = b / b.sum(-1, keepdims=True)
    mh = D.get_metric("Hellinger")
    mj = D.get_metric("Jeffreys")
    mjs = D.get_metric("JensenShannon")
    for x, y in zip(a, b):
        bc = np.sum(np.sqrt(x * y))
        assert mh.pair(x, y) == pytest.approx(np.sqrt(max(0.0, 1 - bc)), abs=1e-4)
        assert mj.pair(x, y) > 0
        # JS distance is bounded by sqrt(ln 2) and symmetric
        assert 0 <= mjs.pair(x, y) <= np.sqrt(np.log(2)) + 1e-6
        assert mjs.pair(x, y) == pytest.approx(mjs.pair(y, x), abs=1e-6)
        assert mh.pair(x, x) == pytest.approx(0.0, abs=1e-6)


def test_hamming_jaccard(rng):
    a = rng.integers(0, 4, (8, 32)).astype(np.uint32)
    b = rng.integers(0, 4, (8, 32)).astype(np.uint32)
    mh, mj = D.get_metric("Hamming"), D.get_metric("Jaccard")
    for x, y in zip(a, b):
        assert mh.pair(x, y) == pytest.approx((x != y).mean())
        expect = 1 - np.minimum(x, y).sum() / max(np.maximum(x, y).sum(), 1e-10)
        assert mj.pair(x, y) == pytest.approx(expect, rel=1e-6)


def test_levenshtein():
    m = D.get_metric("Levenshtein")
    cases = [("kitten", "sitting", 3), ("flaw", "lawn", 2), ("", "abc", 3), ("abc", "abc", 0)]
    for s1, s2, want in cases:
        a = np.array([ord(c) for c in s1], np.uint16)
        b = np.array([ord(c) for c in s2], np.uint16)
        assert m.pair(a, b) == want
    # padded fixed-width arrays strip trailing zeros
    a = np.zeros(16, np.uint16); a[:6] = [ord(c) for c in "kitten"]
    b = np.zeros(16, np.uint16); b[:7] = [ord(c) for c in "sitting"]
    assert m.pair(a, b) == 3


def test_levenshtein_device_kernel(rng):
    """The batched device Levenshtein (cummin-decomposed row DP) equals the
    host DP on padded u16 strings, including empty-after-stripping rows."""
    import jax.numpy as jnp

    B, K, d = 6, 9, 14
    q = rng.integers(0, 5, (B, d)).astype(np.uint16)
    C = rng.integers(0, 5, (B, K, d)).astype(np.uint16)
    q[0] = 0  # empty query after zero-stripping
    C[1, 3] = 0  # empty candidate
    got = np.asarray(D.jnp_scores_levenshtein(
        jnp.asarray(q.astype(np.float32)), jnp.asarray(C.astype(np.float32))))
    want = np.array([[D.np_levenshtein_pair(q[b], C[b, k]) for k in range(K)]
                     for b in range(B)])
    np.testing.assert_array_equal(got, want)


def test_batch_matches_pair(rng):
    q = rng.standard_normal((4, 16)).astype(np.float32)
    X = rng.standard_normal((32, 16)).astype(np.float32)
    for name in ["L1", "L2", "Cosine", "Dot", "Hellinger", "Jeffreys", "JensenShannon"]:
        m = D.get_metric(name)
        qq, XX = (np.abs(q), np.abs(X)) if name in ("Hellinger", "Jeffreys", "JensenShannon") else (q, X)
        mat = m.brute_force(qq, XX)
        assert mat.shape == (4, 32)
        for i in [0, 3]:
            for j in [0, 17]:
                assert mat[i, j] == pytest.approx(m.pair(qq[i], XX[j]), rel=2e-4, abs=2e-5)


def test_jnp_scores_match_numpy(rng):
    import jax.numpy as jnp
    q = np.abs(rng.standard_normal((4, 16))).astype(np.float32)
    C = np.abs(rng.standard_normal((4, 8, 16))).astype(np.float32)
    for name, m in D.DISTANCES.items():
        if m.jnp_scores is None or name.startswith("Dist"):
            continue
        got = np.asarray(m.jnp_scores(jnp.asarray(q), jnp.asarray(C)))
        for b in range(4):
            want = m.brute_force(q[b], C[b])[0]
            np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-5)


def test_gathered_scores_inner_product_forms(rng):
    import jax.numpy as jnp
    from hnsw_tpu.ops.beam_search import scores_gathered
    q = rng.standard_normal((4, 16)).astype(np.float32)
    C = rng.standard_normal((4, 8, 16)).astype(np.float32)
    for name in ["L2", "Dot", "Cosine", "L1", "Hamming"]:
        m = D.get_metric(name)
        got = np.asarray(scores_gathered(name, jnp.asarray(q), jnp.asarray(C)))
        for b in range(4):
            want = m.brute_force(q[b], C[b])[0]
            np.testing.assert_allclose(got[b], want, rtol=3e-4, atol=3e-4)


def test_user_metric(rng):
    m = D.get_metric(lambda a, b: float(np.abs(a - b).max()))
    a, b = _pairs(rng, n=2)
    assert m.pair(a[0], b[0]) == pytest.approx(np.abs(a[0] - b[0]).max())
    assert m.name == "DistPtr"
