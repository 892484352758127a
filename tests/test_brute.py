"""Exact brute-force path: BruteForceIndex and the Pallas fused top-k kernel
(interpreted on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_tpu.models.brute import BruteForceIndex
from hnsw_tpu.ops.distances import get_metric


def test_brute_force_exact(rng):
    n, d, k = 500, 16, 5
    X = rng.standard_normal((n, d)).astype(np.float32)
    bf = BruteForceIndex(dist="L2")
    bf.parallel_insert(list(zip(X, range(n))))
    Q = rng.standard_normal((8, d)).astype(np.float32)
    ids, dists = bf.search_batch(Q, k)
    truth = get_metric("L2").brute_force(Q, X)
    for b in range(8):
        want = np.argsort(truth[b], kind="stable")[:k]
        assert set(ids[b].tolist()) == set(want.tolist())
        np.testing.assert_allclose(dists[b], np.sort(truth[b])[:k], rtol=1e-4)


def test_brute_force_filter_and_single(rng):
    n, d = 200, 8
    X = rng.random((n, d)).astype(np.float32)
    bf = BruteForceIndex()
    for i in range(n):
        bf.insert(X[i], i)
    res = bf.search(X[5], 3)
    assert res[0].d_id == 5
    ids, _ = bf.search_batch(X[:4], 5, filter=sorted(range(0, n, 2)))
    assert all(int(i) % 2 == 0 for row in ids for i in row if i >= 0)
    # knbn > n
    small = BruteForceIndex()
    small.insert(np.ones(4, np.float32), 0)
    ids, d = small.search_batch(np.ones((2, 4), np.float32), 5)
    assert (ids[:, 0] == 0).all() and (ids[:, 1:] == -1).all()


def test_pallas_topk_interpret(rng):
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk, pad_corpus
    n, d, B, k = 300, 32, 8, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((B, d)).astype(np.float32)
    Xp, xsq, perm = pad_corpus(X, tn=256)
    dd, ids = pallas_l2_topk(jnp.asarray(Q), jnp.asarray(Xp), jnp.asarray(xsq),
                             k, tn=256, group=8, interpret=True, acc=1)
    dd, ids = np.array(dd), perm[np.array(ids)]
    truth = get_metric("L2").brute_force(Q, X)
    hits = 0
    for b in range(B):
        want = set(np.argsort(truth[b], kind="stable")[:k].tolist())
        got = set(int(i) for i in ids[b])
        hits += len(got & want)
        # returned distances must be the true distances of the returned ids
        for j in range(k):
            assert dd[b, j] == pytest.approx(truth[b, ids[b, j]], rel=1e-3, abs=1e-3)
    # group-reduce may miss a true neighbor when >=3 land in one group; with
    # group=8 on this scale the hit rate should still be ~1
    assert hits >= B * k - 2, hits


def test_pallas_topk_bf16_scan_refine(rng):
    """bf16 streaming stage + f32 refine (the BruteForceIndex default): the
    reduced-precision first stage must not MISS true neighbors (overfetch
    absorbs bf16 rank noise near the cut), and returned distances must be the
    exact f32 direct-form values because the refine re-scores finalists
    against the full-precision corpus."""
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk, pad_corpus
    n, d, B, k = 2000, 64, 8, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((B, d)).astype(np.float32)
    Xp, xsq, perm = pad_corpus(X, tn=256)
    Xscan = jnp.asarray(Xp).astype(jnp.bfloat16)
    # acc=1: this test targets the bf16/refine contract; at acc=8 the whole
    # 8-tile corpus collapses to one 64-cell block and keep-2 collisions make
    # exact top-k a coin flip at this tiny G (the product configs keep G=128
    # and ~8 blocks — collision P ~ 1e-4)
    dd, ids = pallas_l2_topk(jnp.asarray(Q), jnp.asarray(Xp), jnp.asarray(xsq),
                             k, tn=256, group=8, interpret=True,
                             Xscan=Xscan, overfetch=24, acc=1)
    dd, ids = np.array(dd), perm[np.array(ids)]
    d2 = ((Q[:, None, :].astype(np.float64) - X[None]) ** 2).sum(-1)
    hits = 0
    for b in range(B):
        want = set(np.argsort(d2[b], kind="stable")[:k].tolist())
        hits += len(want & set(int(i) for i in ids[b]))
        np.testing.assert_allclose(
            dd[b], np.sqrt(np.sort(d2[b])[:k]), rtol=1e-4, atol=1e-4)
    assert hits == B * k, hits


def test_pallas_topk_acc_blocks(rng):
    """acc>1 (in-kernel running min1/min2 merge across consecutive tiles):
    multiple output blocks with an UNEVEN tail (n_tiles % acc != 0) must agree
    with the unaccumulated kernel and with brute force."""
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk, pad_corpus
    n, d, B, k = 1700, 32, 8, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((B, d)).astype(np.float32)
    Xp, xsq, perm = pad_corpus(X, tn=256)  # 1792 rows -> 7 tiles; acc=3 -> blocks 3+3+1
    args = (jnp.asarray(Q), jnp.asarray(Xp), jnp.asarray(xsq), k)
    kw = dict(tn=256, group=8, interpret=True)
    d1, i1 = pallas_l2_topk(*args, acc=1, **kw)
    d3, i3 = pallas_l2_topk(*args, acc=3, **kw)
    d2 = ((Q[:, None, :].astype(np.float64) - X[None]) ** 2).sum(-1)
    for b in range(B):
        want = set(np.argsort(d2[b], kind="stable")[:k].tolist())
        assert set(int(i) for i in perm[np.array(i3)[b]]) == want
    np.testing.assert_allclose(np.array(d3), np.array(d1), rtol=1e-5)


def test_pallas_topk_unpacked_matches_packed(rng):
    """packed=False (separate f32/int32 outputs, argmin-recovery chains) is the
    fallback when the index-in-mantissa trick can't apply; it must return the
    same ids/distances as the packed default, including with acc>1."""
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk, pad_corpus
    n, d, B, k = 1500, 32, 8, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((B, d)).astype(np.float32)
    Xp, xsq, perm = pad_corpus(X, tn=256)
    args = (jnp.asarray(Q), jnp.asarray(Xp), jnp.asarray(xsq), k)
    kw = dict(tn=256, group=8, interpret=True, acc=3)
    dp, ip = pallas_l2_topk(*args, packed=True, **kw)
    du, iu = pallas_l2_topk(*args, packed=False, **kw)
    np.testing.assert_array_equal(np.array(ip), np.array(iu))
    np.testing.assert_allclose(np.array(dp), np.array(du), rtol=1e-5)


def test_pallas_topk_stream(rng):
    """Pipelined stream wrapper: multi-batch with an odd tail (padded to the
    compiled batch shape) and f16 query ingest must match brute force."""
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk_stream, pad_corpus
    n, d, k = 1200, 32, 10
    nq, batch = 50, 16  # 3 full batches + tail of 2
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xp, xsq, perm = pad_corpus(X, tn=256)
    dd, ids = pallas_l2_topk_stream(Q, jnp.asarray(Xp), jnp.asarray(xsq), k,
                                    tn=256, group=8, acc=2, batch=batch,
                                    query_dtype="f16", interpret=True)
    d2 = ((Q[:, None, :].astype(np.float64) - X[None]) ** 2).sum(-1)
    for b in range(nq):
        want = set(np.argsort(d2[b], kind="stable")[:k].tolist())
        got = set(int(i) for i in perm[ids[b]])
        # f16 query rounding can flip exact near-ties at the k-th boundary
        assert len(got & want) >= k - 1, (b, got, want)


def test_pallas_topk_small_tiles_and_pick_tn(rng):
    """tn=512/group=4 (the d>512 configuration — large-d VMEM fit) matches brute
    force in interpret mode; pick_tn scales tiles down as d grows."""
    import jax.numpy as jnp
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk, pad_corpus, pick_tn

    assert pick_tn(128) == 2048 and pick_tn(512) == 1024 and pick_tn(784) == 512
    n, d, k = 1500, 32, 5
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((8, d)).astype(np.float32)
    Xp, xsq, perm = pad_corpus(X, tn=512)
    dd, ids = pallas_l2_topk(jnp.asarray(Q), jnp.asarray(Xp), jnp.asarray(xsq),
                             k, tn=512, group=4, interpret=True)
    d2 = ((Q[:, None, :] - X[None]) ** 2).sum(-1)
    true = np.argsort(d2, axis=1)[:, :k]
    assert (perm[np.array(ids)[:, 0]] == true[:, 0]).all()
