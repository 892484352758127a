"""Native C++ core (ffi tier): build/search parity with the Python oracle, filters,
custom distances, and the zero-copy handoff to the TPU-side Hnsw."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from hnsw_tpu.ffi import NativeHnsw, native_lib
    native_lib()
    return NativeHnsw


def _data(rng, n=2000, d=24):
    # low intrinsic dimension so recall is meaningful
    A = rng.standard_normal((8, d)).astype(np.float32)
    return rng.standard_normal((n, 8)).astype(np.float32) @ A


def test_native_build_and_recall(native, rng):
    from hnsw_tpu.ops.distances import get_metric
    X = _data(rng)
    nh = native(max_nb_connection=16, max_elements=len(X), ef_construction=200)
    nh.parallel_insert(X, np.arange(len(X)), n_threads=4)
    assert len(nh) == len(X)
    Q = _data(rng, n=40)
    ids, dists = nh.parallel_search(Q, 10, 64)
    truth = get_metric("L2").brute_force(Q, X)
    hits = sum(int((dists[b][np.isfinite(dists[b])] <= np.sort(truth[b])[9] + 1e-6).sum())
               for b in range(40))
    assert hits / 400 >= 0.9, hits / 400


def test_native_serial_insert_and_search(native, rng):
    X = _data(rng, n=300)
    nh = native(max_nb_connection=12, max_elements=300, ef_construction=100)
    for i, v in enumerate(X):
        nh.insert(v, i)
    ids, dists = nh.search(X[7], 3, 32)
    assert ids[0] == 7 and dists[0] == pytest.approx(0.0, abs=1e-5)


def test_native_filter(native, rng):
    X = _data(rng, n=400)
    nh = native(max_nb_connection=12, max_elements=400, ef_construction=100)
    nh.parallel_insert(X, np.arange(400), n_threads=2)
    ids, _ = nh.search(X[10], 5, 200, filter_fn=lambda i: i % 3 == 0)
    assert len(ids) >= 1 and all(i % 3 == 0 for i in ids)
    ids, _ = nh.search(X[10], 5, 64, filter_fn=lambda i: False)
    assert len(ids) == 0


def test_native_custom_distance(native, rng):
    X = np.abs(_data(rng, n=200)).astype(np.float32)
    nh = native(max_nb_connection=8, max_elements=200, ef_construction=50,
                dist_fn=lambda a, b: float(np.abs(a - b).sum()))
    for i, v in enumerate(X):
        nh.insert(v, i)
    ids, dists = nh.search(X[3], 2, 16)
    assert ids[0] == 3
    assert dists[0] == pytest.approx(0.0, abs=1e-4)


def test_native_to_hnsw_handoff(native, rng):
    """Graphs built natively must serve the full framework: host search, device
    batched search, dump/reload."""
    from hnsw_tpu import HnswIo
    X = _data(rng, n=1500)
    nh = native(max_nb_connection=16, max_elements=1500, ef_construction=150)
    nh.parallel_insert(X, np.arange(1500), n_threads=4)
    h = nh.to_hnsw()
    assert h.get_nb_point() == 1500
    # host search
    res = h.search(X[42], 1, 32)
    assert res and res[0].d_id == 42
    # device batched search
    ids, dists = h.search_batch(X[:32], 1, 32)
    hits = sum(1 for i in range(32) if h.get_origin_id(int(ids[i, 0])) == i)
    assert hits >= 30
    # persistence round trip
    import tempfile
    tmp = tempfile.mkdtemp()
    base = h.file_dump(tmp, "native")
    r = HnswIo(tmp, base).load_hnsw()
    assert h.check_graph_equality(r)


def test_native_distance_values_match(native, rng):
    from hnsw_tpu.ops.distances import get_metric
    X = np.abs(_data(rng, n=64)).astype(np.float32)
    X = X / X.sum(-1, keepdims=True)
    for name in ["L1", "L2", "Cosine", "Hamming", "Jaccard", "Hellinger",
                 "Jeffreys", "JensenShannon"]:
        nh = native(max_nb_connection=8, max_elements=64, ef_construction=32,
                    dist=name)
        for i, v in enumerate(X):
            nh.insert(v, i)
        ids, dists = nh.search(X[5], 3, 16)
        m = get_metric(name)
        for j, i in enumerate(ids):
            want = m.pair(X[5], X[int(i)])
            assert dists[j] == pytest.approx(want, rel=2e-3, abs=2e-3), name


def test_native_typed_elements(native, rng):
    """Element-type parity with the reference's per-type FFI (u8/u16/u32/i32/f64)."""
    for dt, dist in [(np.uint8, "L1"), (np.uint16, "Levenshtein"), (np.uint32, "Jaccard"),
                     (np.int32, "L2"), (np.float64, "L2")]:
        n = 80
        if dt == np.uint16 and dist == "Levenshtein":
            X = rng.integers(97, 123, (n, 8)).astype(dt)
        elif np.issubdtype(dt, np.integer):
            X = rng.integers(0, 100, (n, 12)).astype(dt)
        else:
            X = rng.random((n, 12)).astype(dt)
        nh = native(max_nb_connection=8, max_elements=n, ef_construction=40,
                    dist=dist, dtype=dt)
        for i, v in enumerate(X):
            nh.insert(v, i)
        ids, dists = nh.search(X[5], 3, 16)
        assert ids[0] == 5, (dt, dist, ids)
        assert dists[0] == pytest.approx(0.0, abs=1e-5)
        # typed round trip through the flat-array handoff
        h = nh.to_hnsw()
        assert h.dtype == np.dtype(dt)
        assert h.search(X[5], 1, 16)[0].d_id == 5


def test_native_dump_load_roundtrip(native, rng, tmp_path):
    """Native C ABI dump must reload both natively AND through the Python reader
    (one on-disk format across tiers)."""
    from hnsw_tpu.ffi import NativeHnsw
    from hnsw_tpu import HnswIo
    X = _data(rng, n=400)
    nh = native(max_nb_connection=12, max_elements=400, ef_construction=100)
    nh.parallel_insert(X, np.arange(400), n_threads=2)
    nh.file_dump(tmp_path, "nativedump")
    # native -> native
    r = NativeHnsw.load(tmp_path, "nativedump")
    assert len(r) == 400
    ids, dists = r.search(X[7], 3, 32)
    assert ids[0] == 7
    # native -> python tier
    hp = HnswIo(tmp_path, "nativedump").load_hnsw()
    assert hp.get_nb_point() == 400
    assert hp.search(X[7], 1, 32)[0].d_id == 7
    # python graph equality against the exported native graph
    assert nh.to_hnsw().check_graph_equality(hp)
    # python -> native direction
    hp.file_dump(tmp_path, "pydump")
    r2 = NativeHnsw.load(tmp_path, "pydump")
    assert len(r2) == 400
    assert r2.search(X[7], 1, 32)[0][0] == 7


def test_native_load_recovers_header_metadata(native, rng, tmp_path):
    """A loaded native handle must carry the dump's M/efc/metric so to_hnsw() is
    faithful (reference recovers these via Description, src/hnswio.rs:937-1042)."""
    X = rng.random((120, 10)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    nh = native(max_nb_connection=10, max_elements=120, ef_construction=48,
                dist="Cosine")
    for i, v in enumerate(X):
        nh.insert(v, i)
    nh.file_dump(tmp_path, "metaload")
    from hnsw_tpu.ffi import NativeHnsw
    r = NativeHnsw.load(tmp_path, "metaload")
    assert r.M == 10
    assert r.ef_construction == 48
    assert r.dist_name == "Cosine"
    h = r.to_hnsw()  # crashed before the fix (M=0 -> log(0) in the level sampler)
    assert h.metric.name == "Cosine"
    assert h.max_nb_connection == 10
    assert h.search(X[3], 1, 24)[0].d_id == 3


def test_native_parallel_insert_multi_batch_stress(native, rng):
    """Repeated threaded batches must keep all storage consistent (the arrays are
    pre-sized per batch; allocate() does only indexed writes during the threaded
    phase). On this 1-core container interleaving is limited — the test still
    exercises the pre-size-across-batches logic."""
    d = 16
    nh = native(max_nb_connection=12, max_elements=64, ef_construction=64)
    X = rng.random((900, d)).astype(np.float32)
    for lo in range(0, 900, 300):
        nh.parallel_insert(X[lo:lo + 300], np.arange(lo, lo + 300), n_threads=4)
        assert len(nh) == lo + 300
    ids, dists = nh.parallel_search(X[::90], 1, 32, n_threads=4)
    assert [int(i) for i in ids[:, 0]] == list(range(0, 900, 90))
    h = nh.to_hnsw()
    assert h.get_nb_point() == 900


def test_native_description_and_graph_only_load(native, rng, tmp_path):
    """C ABI header introspection + NoData reload (reference load_hnsw_description /
    DescriptionFFI, libext.rs:1121-1232, and NoData load, libext.rs:446-451)."""
    from hnsw_tpu.ffi import load_hnsw_description, NativeHnsw
    X = rng.random((150, 12)).astype(np.float32)
    nh = native(max_nb_connection=9, max_elements=150, ef_construction=40, dist="L1")
    for i, v in enumerate(X):
        nh.insert(v, i)
    nh.file_dump(tmp_path, "descffi")
    d = load_hnsw_description(tmp_path, "descffi")
    assert d.format_version == 4 and d.dumpmode == 1
    assert d.max_nb_connection == 9
    assert d.ef_construction == 40
    assert d.nb_point == 150 and d.dimension == 12
    assert d.t_name == b"f32"
    assert b"DistL1" in d.distname
    with pytest.raises(IOError):
        load_hnsw_description(tmp_path, "no-such-dump")
    # graph-only: full topology, no vectors
    g = NativeHnsw.load_graph_only(tmp_path, "descffi")
    assert len(g) == 150 and g.dist_name == "L1" and g.M == 9
    ids, dd = g.search(X[0], 3, 16)
    assert len(ids) == 0  # no data -> search yields nothing (documented contract)
    h = g.to_hnsw()  # topology export works and matches the full reload's graph
    full = NativeHnsw.load(tmp_path, "descffi").to_hnsw()
    assert h.check_graph_equality(full)


def test_native_ptrdist_dump_reload(native, rng, tmp_path):
    """Custom-distance persistence on the native tier (VERDICT r2 next #7):
    hnsw_load on a DistPtr dump is a HARD error (never a silent L2 remap);
    hnsw_load_ptrdist with the fn restores the index (reference
    load_hnsw_with_dist, src/hnswio.rs:531-613)."""
    X = np.abs(_data(rng, n=150)).astype(np.float32)

    def manhattan(a, b):
        return float(np.abs(a - b).sum())

    nh = native(max_nb_connection=10, max_elements=len(X), ef_construction=64,
                dist_fn=manhattan)
    nh.parallel_insert(X, np.arange(len(X)), n_threads=2)
    nh.file_dump(tmp_path, "ptrd")
    with pytest.raises(IOError):
        native.load(tmp_path, "ptrd")  # no fn -> error, not L2
    r = native.load_ptrdist(tmp_path, "ptrd", manhattan)
    assert len(r) == len(X)
    ids, dists = r.search(X[13], 3, 48)
    assert ids[0] == 13 and dists[0] == pytest.approx(0.0, abs=1e-5)
    # distances really come from the custom fn (L1 != L2 on this data)
    want = manhattan(X[13], X[int(ids[1])])
    assert dists[1] == pytest.approx(want, rel=1e-4)


def test_native_reload_keeps_metric(native, rng, tmp_path):
    """A Dot dump must reload as Dot (dist_from_name used to drop the
    'anndists::dist::distances::' path prefix match and default every reload
    to L2)."""
    from hnsw_tpu.ops.distances import l2_normalize
    X = l2_normalize(_data(rng, n=200))
    nh = native(max_nb_connection=10, max_elements=len(X), ef_construction=64,
                dist="Dot")
    nh.parallel_insert(X, np.arange(len(X)), n_threads=2)
    nh.file_dump(tmp_path, "dotd")
    r = native.load(tmp_path, "dotd")
    assert r.dist_name == "Dot"
    q = X[3]
    ids, dists = r.search(q, 3, 48)
    want = 1.0 - float(X[int(ids[1])] @ q)  # Dot distance, not L2
    assert dists[1] == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_native_from_hnsw_round_trip(native, rng):
    """Flat-array import (hnsw_import_*) is the inverse of to_hnsw."""
    from hnsw_tpu import Hnsw
    from hnsw_tpu.ffi import NativeHnsw
    X = _data(rng, n=250)
    h = Hnsw(max_nb_connection=10, max_elements=len(X), ef_construction=80)
    for i, v in enumerate(X):
        h.insert(v, i)
    nh = NativeHnsw.from_hnsw(h)
    assert len(nh) == len(X)
    ids, dists = nh.search(X[42], 3, 48)
    assert ids[0] == 42 and dists[0] == pytest.approx(0.0, abs=1e-5)
    back = nh.to_hnsw()
    assert h.check_graph_equality(back)


def test_native_log_init(native, capfd):
    """C-ABI logging init (init_rust_log analog, VERDICT r2 next #7): debug
    level makes the native tier report operations on stderr."""
    from hnsw_tpu.ffi import init_native_log
    init_native_log(2)
    try:
        nh = native(max_nb_connection=8, max_elements=64, ef_construction=32)
        nh.parallel_insert(np.random.default_rng(0).random((64, 8)).astype(np.float32),
                           np.arange(64), n_threads=1)
        err = capfd.readouterr().err
        assert "[hnsw_core]" in err
    finally:
        init_native_log(0)
