"""Validates bench.py's ground-truth method: the TPU exact-scan candidate pool
re-scored in fp64 must yield the SAME k-th neighbor threshold as the full host
fp64 oracle (the pool is exact f32 top-POOL; the true fp64 k-th neighbor cannot
sit outside it — see the strategy note in bench.py)."""
import numpy as np
import jax.numpy as jnp


def test_pool_gt_matches_host_oracle():
    rng = np.random.default_rng(99)
    n, d, nq, k, pool = 5000, 64, 64, 10, 40
    # bench-like low-intrinsic-dim data with near-tie structure
    A = rng.standard_normal((8, d)).astype(np.float32) / np.sqrt(8)
    X = (rng.standard_normal((n, 8), dtype=np.float32) @ A
         + 0.02 * rng.standard_normal((n, d), dtype=np.float32))
    Q = (rng.standard_normal((nq, 8), dtype=np.float32) @ A
         + 0.02 * rng.standard_normal((nq, d), dtype=np.float32))

    # host fp64 oracle
    kth_host = np.empty(nq)
    for b in range(nq):
        dv = X.astype(np.float64) - Q[b].astype(np.float64)
        kth_host[b] = np.sqrt(np.partition((dv * dv).sum(-1), k - 1)[k - 1])

    # TPU pool method (interpret mode on CPU)
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk_stream, pad_corpus
    Xp, xsq, perm = pad_corpus(X, tn=256)
    _, pool_ids = pallas_l2_topk_stream(Q, jnp.asarray(Xp), jnp.asarray(xsq),
                                        pool, tn=256, group=8, acc=2,
                                        batch=32, interpret=True)
    pool_ids = perm[np.clip(pool_ids, 0, n - 1)]
    kth_pool = np.empty(nq)
    for b in range(nq):
        rows = X[pool_ids[b]].astype(np.float64)
        dv = rows - Q[b].astype(np.float64)
        kth_pool[b] = np.sqrt(np.partition((dv * dv).sum(-1), k - 1)[k - 1])

    np.testing.assert_allclose(kth_pool, kth_host, rtol=0, atol=0)


def test_make_dataset_corpus_independent_of_nq():
    """Round-5 regression: the corpus must be a function of (seed, n, d,
    intrinsic) ONLY. Historically X's noise was drawn from the shared rng
    stream AFTER the nq-sized query draws, so recreating the dataset with a
    different BENCH_QBATCH produced a DIFFERENT corpus — cross-process
    harnesses scoring a saved snapshot against the recreation measured a fake
    ~3-point recall regression."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_dataset

    for kind in ("gauss", "clustered"):
        X1, Q1 = make_dataset(kind, np.random.default_rng(1234), 3000, 64, 32, 8)
        X2, Q2 = make_dataset(kind, np.random.default_rng(1234), 3000, 256, 32, 8)
        np.testing.assert_array_equal(X1, X2)
        # and queries are reproducible for a given nq
        _, Q3 = make_dataset(kind, np.random.default_rng(1234), 3000, 64, 32, 8)
        np.testing.assert_array_equal(Q1, Q3)
        assert Q1.shape == (64, 32) and Q2.shape == (256, 32)
