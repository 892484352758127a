"""Multi-chip sharded execution on the virtual 8-device CPU mesh (SURVEY.md §4:
'multi-node without a real cluster')."""

import numpy as np
import jax
import pytest

from hnsw_tpu.parallel.sharded import ShardedHnsw, default_mesh
from hnsw_tpu.ops.distances import get_metric


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual CPU devices"
    return default_mesh(8)


def test_sharded_recall_beats_single_graph_floor(rng, mesh8):
    n, d, k = 4000, 16, 10
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=100, dist="L2")
    sh.parallel_insert(list(zip(X, range(n))), mode="serial")
    assert len(sh) == n
    Q = rng.random((24, d)).astype(np.float32)
    ids, dists = sh.search_batch(Q, k, 48)
    assert ids.shape == (24, k)
    truth = get_metric("L2").brute_force(Q, X)
    hits = 0
    for b in range(24):
        kth = np.sort(truth[b])[k - 1]
        hits += int((dists[b] <= kth + 1e-6).sum())
    recall = hits / (24 * k)
    assert recall >= 0.9, f"sharded recall {recall}"
    # returned ids are external and distances correct
    for b in range(4):
        for j in range(k):
            if ids[b, j] >= 0:
                assert dists[b, j] == pytest.approx(truth[b, ids[b, j]], rel=1e-4,
                                                    abs=1e-4)


def test_sharded_self_retrieval(rng, mesh8):
    n, d = 2000, 12
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=80, dist="L2")
    sh.parallel_insert(list(zip(X, range(n))), mode="serial")
    ids, _ = sh.search_batch(X[:64], 1, 24)
    hits = sum(1 for i in range(64) if int(ids[i, 0]) == i)
    assert hits >= 62


def test_dryrun_multichip_entrypoint():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    ids, dists = (np.asarray(o) for o in out)
    assert ids.shape == (8, 10)
    assert np.isfinite(dists[:, 0]).all()


def test_sharded_more_shards_than_points(rng, mesh8):
    """Empty shards (n < n_shards) must not leak external id -1 with finite distances
    into the merged top-k (their padding beats nothing)."""
    n, d, k = 5, 8, 5
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=8, max_elements=16,
                     ef_construction=32, dist="L2")
    sh.parallel_insert(list(zip(X, range(n))), mode="serial")
    ids, dists = sh.search_batch(X[:3], k, 16)
    for b in range(3):
        finite = np.isfinite(dists[b])
        assert (ids[b][finite] >= 0).all(), (ids[b], dists[b])
        assert set(ids[b][finite]) == set(range(n))
        assert int(ids[b, 0]) == b


def test_mesh_build_product_path(rng, mesh8):
    """The product build path: parallel_insert(mode="mesh") drives one jitted
    data-parallel round per step that advances ALL 8 shard tables at once (no
    per-shard Python loop), and the resulting sharded index searches correctly."""
    n, d, k = 4000, 16, 10
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=100, dist="L2")
    sh.parallel_insert(list(zip(X, range(n))), mode="mesh", batch_size=128)
    assert len(sh) == n
    for s in sh.shards:  # every shard advanced by the shared jitted rounds
        assert s._nb_point == n // 8
        assert (s._layers[0].counts[1: s._nb_point] > 0).mean() > 0.95
    Q = rng.random((24, d)).astype(np.float32)
    ids, dists = sh.search_batch(Q, k, 48)
    truth = get_metric("L2").brute_force(Q, X)
    hits = 0
    for b in range(24):
        kth = np.sort(truth[b])[k - 1]
        hits += int((dists[b] <= kth + 1e-6).sum())
    assert hits / (24 * k) >= 0.9, hits / (24 * k)
    ids2, _ = sh.search_batch(X[:32], 1, 24)
    assert sum(1 for i in range(32) if int(ids2[i, 0]) == i) >= 31


def test_mesh_build_uneven_shards(rng, mesh8):
    """n not divisible by n_shards: round-robin buckets differ by one; the mesh
    rounds pad internally and every point must remain searchable."""
    n, d, k = 3001, 12, 5
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=10, max_elements=n // 8 + 9,
                     ef_construction=64, dist="L2")
    sh.parallel_insert(list(zip(X, range(n))), mode="mesh", batch_size=128)
    assert len(sh) == n
    sizes = sorted(s._nb_point for s in sh.shards)
    assert sizes[-1] - sizes[0] <= 1 and sum(sizes) == n
    # the remainder point (external id n-1) is findable
    ids, dists = sh.search_batch(X[n - 1: n], 1, 24)
    assert int(ids[0, 0]) == n - 1
    Q = rng.random((16, d)).astype(np.float32)
    ids, dists = sh.search_batch(Q, k, 32)
    truth = get_metric("L2").brute_force(Q, X)
    hits = 0
    for b in range(16):
        kth = np.sort(truth[b])[k - 1]
        hits += int((dists[b] <= kth + 1e-6).sum())
    assert hits / (16 * k) >= 0.85, hits / (16 * k)


def test_sharded_codec_fast_path_matches_exact(rng, mesh8):
    """The mesh fast path (per-shard int8 codec + exact rerank) must return the
    same neighbors as exact sharded traversal — the codec measured zero recall
    loss single-chip; sharded it must hold per shard too (VERDICT r2 next #2)."""
    n, d, k = 4000, 16, 10
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=100, dist="L2")
    sh.parallel_insert((X, np.arange(n)), mode="mesh", batch_size=128)
    Q = rng.random((16, d)).astype(np.float32)
    sh.set_traversal_codec(None)
    ids_exact, d_exact = sh.search_batch(Q, k, 48)
    sh.set_traversal_codec("i8")
    assert sh.device_codec_arrays() is not None
    ids_codec, d_codec = sh.search_batch(Q, k, 48)
    agree = (ids_exact == ids_codec).mean()
    assert agree >= 0.95, f"codec/exact agreement {agree}"
    # rerank restored exact f32 distances: where ids agree, dists agree tightly
    same = ids_exact == ids_codec
    np.testing.assert_allclose(d_exact[same], d_codec[same], rtol=1e-5, atol=1e-6)


def test_sharded_filtered_search(rng, mesh8):
    """In-search filtering on the sharded tier: only filter-passing external ids
    come back, and recall within the allowed subset stays high."""
    n, d, k = 3000, 12, 5
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=80, dist="L2")
    sh.parallel_insert((X, np.arange(n)), mode="mesh", batch_size=128)
    sh.set_traversal_codec("i8")
    allowed = np.arange(0, n, 3)
    Q = rng.random((16, d)).astype(np.float32)
    ids, dists = sh.search_batch(Q, k, 48, filter=allowed)
    got = ids[ids >= 0]
    assert len(got) and (got % 3 == 0).all(), "filter leaked disallowed ids"
    truth = get_metric("L2").brute_force(Q, X[allowed])
    hits = 0
    for b in range(16):
        kth = np.sort(truth[b])[k - 1]
        hits += int((dists[b][np.isfinite(dists[b])] <= kth + 1e-6).sum())
    assert hits / (16 * k) >= 0.85, hits / (16 * k)


def test_sharded_64bit_external_ids(rng, mesh8):
    """External ids >= 2^32 must survive the multi-chip tier intact (the device
    merge carries (shard, local) int32 pairs; int64 ids resolve on host —
    reference DataId is usize, src/hnsw.rs:51). Also checks shard_of placement."""
    n, d = 1200, 8
    X = rng.random((n, d)).astype(np.float32)
    base = np.int64(2**32 + 7)
    ids64 = base + 3 * np.arange(n, dtype=np.int64)  # all >= 2^32, none int32-safe
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=10, max_elements=n // 8 + 8,
                     ef_construction=64, dist="L2")
    sh.parallel_insert((X, ids64), mode="mesh", batch_size=128)
    out, dists = sh.search_batch(X[:32], 1, 24)
    assert out.dtype == np.int64
    hits = sum(1 for i in range(32) if int(out[i, 0]) == int(ids64[i]))
    assert hits >= 31, out[:, 0]
    # shard_of reports the recorded placement, not an arange assumption
    for i in (0, 1, 7, n - 1):
        s = sh.shard_of(int(ids64[i]))
        assert int(ids64[i]) in sh.shards[s]._origin[: sh.shards[s]._nb_point]
    import pytest as _pt
    with _pt.raises(KeyError):
        sh.shard_of(12345)


def test_mesh_build_dot_metric(rng, mesh8):
    """Mesh build + merged search under an inner-product metric (the merge
    compares raw Dot distances across shards — ordering must survive)."""
    from hnsw_tpu.ops.distances import l2_normalize
    n, d, k = 2048, 12, 5
    X = l2_normalize(rng.standard_normal((n, d)).astype(np.float32))
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=10, max_elements=n // 8 + 8,
                     ef_construction=64, dist="Dot")
    sh.parallel_insert(list(zip(X, range(n))), mode="mesh", batch_size=128)
    Q = l2_normalize(rng.standard_normal((12, d)).astype(np.float32))
    ids, dists = sh.search_batch(Q, k, 32)
    truth = get_metric("Dot").brute_force(Q, X)
    hits = 0
    for b in range(12):
        kth = np.sort(truth[b])[k - 1]
        hits += int((dists[b] <= kth + 1e-5).sum())
    assert hits / (12 * k) >= 0.8, hits / (12 * k)


def test_sharded_exact_scan(rng, mesh8):
    """exact_search_batch: recall 1.0 by construction (per-shard exact top-k
    union contains the global top-k), 64-bit external ids survive, filters
    apply in-scan."""
    n, d, k = 3000, 16, 10
    X = rng.random((n, d)).astype(np.float32)
    big = np.int64(2) ** 33
    ext = (np.arange(n, dtype=np.int64) * 7 + big)  # non-arange, > 2^32
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=80, dist="L2")
    sh.parallel_insert((X, ext), mode="serial")
    Q = rng.random((16, d)).astype(np.float32)
    ids, dists = sh.exact_search_batch(Q, k)
    truth = get_metric("L2").brute_force(Q, X)
    for b in range(16):
        want = ext[np.argsort(truth[b], kind="stable")[:k]]
        assert set(ids[b].tolist()) == set(want.tolist()), b
        np.testing.assert_allclose(dists[b], np.sort(truth[b])[:k],
                                   rtol=1e-4, atol=1e-4)
    # filtered: only multiples of 3 in the EXTERNAL id space
    fil = sorted(int(e) for e in ext if e % 3 == 0)
    fids, fd = sh.exact_search_batch(Q, k, filter=fil)
    assert (fids % 3 == 0).all()
    restr = np.array([i for i in range(n) if ext[i] % 3 == 0])
    truth_r = get_metric("L2").brute_force(Q, X[restr])
    for b in range(16):
        np.testing.assert_allclose(fd[b], np.sort(truth_r[b])[:k],
                                   rtol=1e-4, atol=1e-4)


def test_sharded_exact_scan_rejects_non_matmul_metric(rng, mesh8):
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=8, max_elements=64,
                     ef_construction=40, dist="Hamming", dtype=np.int32)
    sh.parallel_insert(list(zip(rng.integers(0, 2, (32, 8)).astype(np.int32),
                                range(32))), mode="serial")
    with pytest.raises(ValueError):
        sh.exact_search_batch(rng.integers(0, 2, (4, 8)).astype(np.int32), 5)


def test_sharded_dump_reload(rng, mesh8, tmp_path):
    """file_dump/load round-trips the sharded index: per-shard graphs equal,
    search results identical (mesh checkpoint/resume — SURVEY §5)."""
    n, d, k = 1600, 12, 5
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=10, max_elements=n // 8 + 8,
                     ef_construction=64, dist="L2")
    sh.parallel_insert(list(zip(X, range(n))), mode="serial")
    base = sh.file_dump(tmp_path, "meshidx")
    r = ShardedHnsw.load(tmp_path, base, mesh=sh.mesh, max_nb_connection=10,
                         max_elements=n // 8 + 8, ef_construction=64, dist="L2")
    assert len(r) == n
    for s in range(8):
        assert sh.shards[s].check_graph_equality(r.shards[s])
    Q = rng.random((8, d)).astype(np.float32)
    i1, d1 = sh.search_batch(Q, k, 32)
    i2, d2 = r.search_batch(Q, k, 32)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_sharded_exact_scan_modes_agree(rng, mesh8):
    """The tiled fori_loop scan (multi-tile: tile << corpus) and the per-shard
    Pallas kernel scan (interpret mode on the CPU mesh) must both reproduce
    the exact brute-force answer — VERDICT r3 weak #6 (the old one-shot matmul
    materialized [B, cap1] per shard)."""
    n, d, k = 2000, 16, 10
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=80, dist="L2")
    sh.parallel_insert((X, np.arange(n, dtype=np.int64)), mode="serial")
    Q = rng.random((16, d)).astype(np.float32)
    truth = get_metric("L2").brute_force(Q, X)
    want = [set(np.argsort(truth[b], kind="stable")[:k].tolist())
            for b in range(len(Q))]
    # multi-tile tiled path: tile=64 << cap1 forces the fori_loop + the
    # clamped last tile (cap1 is not a multiple of 64)
    ids_t, d_t = sh.exact_search_batch(Q, k, mode="tiled", tile=64)
    # explicit pallas path (interpreted on the CPU mesh)
    ids_p, d_p = sh.exact_search_batch(Q, k, mode="pallas")
    for b in range(len(Q)):
        assert set(ids_t[b].tolist()) == want[b], b
        assert set(ids_p[b].tolist()) == want[b], b
        np.testing.assert_allclose(d_t[b], np.sort(truth[b])[:k], rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(d_p[b], np.sort(truth[b])[:k], rtol=1e-4,
                                   atol=1e-4)


def test_sharded_search_stream(rng, mesh8):
    """Pipelined sharded serving: same results as the synchronous
    search_batch, in input order, across multiple pipelined batches (including
    a padded tail), with an in-stream filter and f16 ingest."""
    n, d, k = 3000, 16, 10
    X = rng.random((n, d)).astype(np.float32)
    sh = ShardedHnsw(mesh=mesh8, max_nb_connection=12, max_elements=n // 8 + 8,
                     ef_construction=100, dist="L2")
    sh.parallel_insert((X, np.arange(n, dtype=np.int64)), mode="serial")
    Q = rng.random((100, d)).astype(np.float32)  # 100 = 3 batches of 40 + tail
    ids_b, d_b = sh.search_batch(Q, k, ef=64)
    ids_s, d_s = sh.search_stream(Q, k, ef=64, batch=40)
    np.testing.assert_array_equal(ids_s, ids_b)
    np.testing.assert_allclose(d_s, d_b, rtol=1e-6)
    # filtered stream (mask uploads once) matches filtered batch
    fil = sorted(range(0, n, 3))
    fids_b, fd_b = sh.search_batch(Q, k, ef=64, filter=fil)
    fids_s, fd_s = sh.search_stream(Q, k, ef=64, filter=fil, batch=40)
    np.testing.assert_array_equal(fids_s, fids_b)
    # f16 ingest serves (recall checked elsewhere; here: shape/order contract)
    ids_h, _ = sh.search_stream(Q, k, ef=64, batch=40, query_dtype="f16")
    assert ids_h.shape == ids_b.shape
    assert (np.sort(ids_h[:, :1], 0) == np.sort(ids_b[:, :1], 0)).mean() > 0.9
