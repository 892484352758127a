"""Device batched insertion rounds vs the serial oracle (analog of reference
``tests/equality.rs``: parallel-vs-serial build equivalence via self-retrieval),
plus unit tests of the sort-based reverse-link merge."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_tpu import Hnsw
from hnsw_tpu.ops.distances import get_metric, l2_normalize


def _self_retrieval_rate(h, X, ef=24):
    found = 0
    n = len(X)
    ids, _ = h.search_batch(X, 1, ef)
    for i in range(n):
        if ids[i, 0] >= 0 and h.get_origin_id(int(ids[i, 0])) == i:
            found += 1
    return found / n


def test_reverse_merge_unit():
    from hnsw_tpu.ops.insert_rounds import _reverse_merge
    cap1, width = 17, 4
    tbl_ids = jnp.full((cap1, width), -1, jnp.int32)
    tbl_d = jnp.full((cap1, width), jnp.inf, jnp.float32)
    # existing row for target 3: neighbors [10 (d=1.0), 11 (d=2.0)]
    tbl_ids = tbl_ids.at[3, :2].set(jnp.array([10, 11]))
    tbl_d = tbl_d.at[3, :2].set(jnp.array([1.0, 2.0]))
    # edges: two sources add links to target 3, one duplicated, one to target 5
    eq = jnp.array([3, 3, 3, 5, 3], jnp.int32)
    esrc = jnp.array([7, 8, 7, 9, 12], jnp.int32)  # (3,7) duplicated
    ed = jnp.array([0.5, 3.0, 0.5, 0.1, 1.5], jnp.float32)
    valid = jnp.array([True, True, True, True, True])
    ids2, d2 = _reverse_merge(tbl_ids, tbl_d, eq, esrc, ed, valid, width)
    row3 = np.array(ids2[3])
    rd3 = np.array(d2[3])
    # union for 3: (7,0.5),(10,1.0),(12,1.5),(11,2.0),(8,3.0) -> top-4
    assert row3.tolist() == [7, 10, 12, 11]
    np.testing.assert_allclose(rd3, [0.5, 1.0, 1.5, 2.0], rtol=1e-6)
    assert np.array(ids2[5]).tolist() == [9, -1, -1, -1]
    # untouched rows stay empty
    assert (np.array(ids2[4]) == -1).all()


def test_reverse_merge_overflow_and_invalid():
    from hnsw_tpu.ops.insert_rounds import _reverse_merge
    cap1, width = 33, 3
    tbl_ids = jnp.full((cap1, width), -1, jnp.int32)
    tbl_d = jnp.full((cap1, width), jnp.inf, jnp.float32)
    # 6 incoming for one target with width 3 -> keep 3 nearest
    eq = jnp.full((6,), 2, jnp.int32)
    esrc = jnp.arange(10, 16, dtype=jnp.int32)
    ed = jnp.array([5.0, 1.0, 3.0, 2.0, 4.0, 6.0], jnp.float32)
    valid = jnp.array([True, True, True, True, False, True])  # drop the 4.0 edge
    ids2, d2 = _reverse_merge(tbl_ids, tbl_d, eq, esrc, ed, valid, width)
    assert np.array(ids2[2]).tolist() == [11, 13, 12]
    np.testing.assert_allclose(np.array(d2[2]), [1.0, 2.0, 3.0], rtol=1e-6)


def test_select_neighbours_batched_matches_oracle(rng):
    """Device diversity prune == host oracle prune on identical candidates."""
    from hnsw_tpu.ops.insert_rounds import select_neighbours_batched
    n, d = 64, 8
    X = rng.random((n, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=4, max_elements=n, ef_construction=32, dist="L2")
    for i, v in enumerate(X):
        h.insert(v, i)
    metric = get_metric("L2")
    g = h.device_graph()
    q = rng.random((3, d)).astype(np.float32)
    dm = metric.brute_force(q, X)
    C = 16
    cand_sets = []
    for b in range(3):
        order = np.argsort(dm[b])[:C]
        cand_sets.append((order, dm[b][order]))
    cand_ids = jnp.asarray(np.stack([o for o, _ in cand_sets]).astype(np.int32))
    cand_d = jnp.asarray(np.stack([dd for _, dd in cand_sets]).astype(np.float32))
    sel_ids, sel_d = select_neighbours_batched("L2", g.vectors, g.sqnorms,
                                               cand_ids, cand_d, 4, False)
    for b in range(3):
        oracle = h._select_neighbours(q[b], list(zip(cand_sets[b][1].tolist(),
                                                     cand_sets[b][0].tolist())),
                                      4, False, 0, False)
        got = [int(i) for i in np.array(sel_ids[b]) if i >= 0]
        want = [i for _, i in oracle]
        assert got == want, (b, got, want)


def test_device_build_self_retrieval(rng):
    """Analog of reference tests/equality.rs: device-built index must self-retrieve."""
    n, d = 3000, 16
    X = rng.random((n, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=100, dist="L2")
    h.parallel_insert(list(zip(X, range(n))), mode="device", batch_size=256)
    assert h.get_nb_point() == n
    rate = _self_retrieval_rate(h, X, ef=32)
    assert rate >= 0.98, f"device-build self-retrieval {rate}"


def test_device_build_recall_vs_serial(rng):
    """Device rounds must reach the serial oracle's recall on held-out queries."""
    n, d, k = 2500, 12, 10
    X = rng.random((n, d)).astype(np.float32)
    Q = rng.random((32, d)).astype(np.float32)
    metric = get_metric("L2")
    truth = metric.brute_force(Q, X)

    def recall(h):
        ids, dists = h.search_batch(Q, k, 64)
        hits = 0
        for b in range(len(Q)):
            kth = np.sort(truth[b])[k - 1]
            hits += int((dists[b] <= kth + 1e-6).sum())
        return hits / (len(Q) * k)

    hd = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=100, dist="L2")
    hd.parallel_insert(list(zip(X, range(n))), mode="device", batch_size=512)
    r_dev = recall(hd)
    hs = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=100, dist="L2")
    hs.parallel_insert(list(zip(X, range(n))), mode="serial")
    r_ser = recall(hs)
    assert r_dev >= 0.9, f"device recall {r_dev} (serial {r_ser})"
    assert r_dev >= r_ser - 0.05, f"device {r_dev} much worse than serial {r_ser}"


def test_device_build_continue_and_search(rng):
    """Device build on an existing serially-built index (mixed growth)."""
    n1, n2, d = 300, 2200, 10
    X = rng.random((n1 + n2, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=12, max_elements=n1 + n2, ef_construction=80, dist="L2")
    for i in range(n1):
        h.insert(X[i], i)
    h.parallel_insert([(X[i], i) for i in range(n1, n1 + n2)], mode="device",
                      batch_size=256)
    assert h.get_nb_point() == n1 + n2
    rate = _self_retrieval_rate(h, X, ef=32)
    assert rate >= 0.97, rate
    # serial search still works on the updated host tables
    res = h.search(X[5], 1, 32)
    assert res and res[0].d_id == 5


def test_extend_candidates_batched_unit(rng):
    """Widening pulls in candidates' layer-0 neighbours, deduped, distance-sorted
    (reference select_neighbours extension, src/hnsw.rs:1317-1362)."""
    from hnsw_tpu.ops.insert_rounds import extend_candidates_batched
    d = 4
    # points laid out on a line so distances are unambiguous
    X = np.zeros((9, d), np.float32)
    X[:, 0] = np.arange(9, dtype=np.float32)
    cap1 = 9  # last row is the sink
    vectors = jnp.asarray(X)
    sqnorms = (vectors * vectors).sum(-1)
    # layer-0 table: candidate 2's neighbours are {1, 3}; candidate 5's are {3, 6}
    tbl0 = jnp.full((cap1, 2), -1, jnp.int32)
    tbl0 = tbl0.at[2].set(jnp.array([1, 3])).at[5].set(jnp.array([3, 6]))
    q = jnp.asarray(X[[2]])  # query sits on point 2
    cand_ids = jnp.asarray(np.array([[2, 5, -1, -1]], np.int32))
    cand_d = jnp.asarray(np.array([[0.0, 3.0, np.inf, np.inf]], np.float32))
    act = jnp.asarray(np.array([True]))
    out_ids, out_d = extend_candidates_batched("L2", vectors, sqnorms, tbl0, q,
                                               cand_ids, cand_d, nb_conn=4, act=act,
                                               k_out=6)
    got = [int(i) for i in np.array(out_ids[0]) if i >= 0]
    # pool = {2, 5} u neighbours {1, 3, 3, 6} deduped -> sorted by dist to q=2:
    # 2(0), 1(1), 3(1), 5(3), 6(4)
    assert sorted(got) == [1, 2, 3, 5, 6]
    assert got[0] == 2 and set(got[1:3]) == {1, 3} and got[3] == 5 and got[4] == 6
    dd = np.array(out_d[0])[:5]
    np.testing.assert_allclose(dd, [0.0, 1.0, 1.0, 3.0, 4.0], rtol=1e-6)


def test_extend_candidates_passthrough(rng):
    """No point triggers -> candidates pass through unchanged (top-k_out window)."""
    from hnsw_tpu.ops.insert_rounds import extend_candidates_batched
    n, d = 32, 6
    X = rng.random((n, d)).astype(np.float32)
    vectors = jnp.asarray(X)
    sqnorms = (vectors * vectors).sum(-1)
    tbl0 = jnp.full((n, 4), -1, jnp.int32)
    q = jnp.asarray(X[:2])
    cand_ids = jnp.asarray(np.tile(np.arange(8, dtype=np.int32), (2, 1)))
    cand_d = jnp.asarray(np.sort(rng.random((2, 8)).astype(np.float32), axis=1))
    act = jnp.ones((2,), bool)
    out_ids, out_d = extend_candidates_batched("L2", vectors, sqnorms, tbl0, q,
                                               cand_ids, cand_d, nb_conn=3, act=act,
                                               k_out=8)
    # every point has 8 > nb_conn=3 candidates -> untouched
    np.testing.assert_array_equal(np.array(out_ids), np.array(cand_ids))
    np.testing.assert_allclose(np.array(out_d), np.array(cand_d), rtol=1e-6)


def test_device_build_with_extend_candidates(rng):
    """Device build with extend_candidates on (the reference hardcodes it on reload,
    hnswio.rs:507-518) still produces a searchable graph at least as good."""
    n, d = 1500, 12
    X = rng.random((n, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    h.set_extend_candidates(True)
    h.parallel_insert(list(zip(X, range(n))), mode="device", batch_size=256)
    assert h.get_nb_point() == n
    rate = _self_retrieval_rate(h, X, ef=32)
    # measured 0.955 at this (M=8, efc=48) config with extension on OR off — the
    # widening only fires on tiny/sparse graphs where the beam already saw everything
    assert rate >= 0.93, rate


def test_device_build_cosine(rng):
    n, d = 2100, 24
    X = l2_normalize(rng.standard_normal((n, d)).astype(np.float32))
    h = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=100, dist="Cosine")
    h.parallel_insert(list(zip(X, range(n))), mode="device", batch_size=512)
    rate = _self_retrieval_rate(h, X, ef=32)
    assert rate >= 0.97, rate


def test_array_ingest_equivalence(rng):
    """parallel_insert accepts a bare 2-D array or an (X, ids) pair; the bulk
    ingest path must produce a graph IDENTICAL to the tuple-list path (same
    seeded level stream, same round schedule)."""
    from hnsw_tpu import Hnsw
    n, d = 2500, 12
    X = rng.random((n, d)).astype(np.float32)

    def build(inp):
        h = Hnsw(max_nb_connection=10, max_elements=n, ef_construction=64,
                 dist="L2")
        h.parallel_insert(inp, mode="device", batch_size=512)
        return h

    h1 = build(list(zip(X, range(n))))
    h2 = build(X)
    h3 = build((X, np.arange(n)))
    assert h1.check_graph_equality(h2)
    assert h1.check_graph_equality(h3)
    import pytest
    with pytest.raises(ValueError):
        build((X, np.arange(n - 1)))
