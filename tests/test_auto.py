"""AutoIndex: engine selection + delegation.

The reference has a single engine; on TPU the exact MXU scan is a product
path in its own right, and AutoIndex routes between the two by the measured
crossovers (models/auto.py module docstring)."""
import numpy as np
import pytest

from hnsw_tpu import AutoIndex, BruteForceIndex, Hnsw


@pytest.fixture
def rng():
    return np.random.default_rng(41)


def _pairs(rng, n, d):
    X = rng.standard_normal((n, d)).astype(np.float32)
    return X, list(zip(X, range(n)))


def test_choice_small_corpus_scans(rng):
    X, pairs = _pairs(rng, 300, 16)
    a = AutoIndex(dist="L2")
    a.parallel_insert(pairs)
    assert a.choose_engine() == "scan"
    assert a.engine_name == "scan"
    assert isinstance(a.engine, BruteForceIndex)


def test_choice_rules(rng):
    a = AutoIndex(dist="L2")
    a.SCAN_MIN = 100  # shrink thresholds for test scale
    X, pairs = _pairs(rng, 200, 32)
    a.parallel_insert(pairs)
    assert a.choose_engine() == "hnsw"  # large-N low-d moderate recall

    b = AutoIndex(dist="L2", recall_target=0.995)
    b.SCAN_MIN = 100
    b.parallel_insert(pairs)
    assert b.choose_engine() == "scan"  # high recall within scan budget

    c = AutoIndex(dist="L2", recall_target=0.995)
    c.SCAN_MIN = 100
    c.SCAN_BUDGET = 100  # pretend corpus exceeds the scan budget
    c.parallel_insert(pairs)
    assert c.choose_engine() == "hnsw"

    e = AutoIndex(dist="L2")
    e.SCAN_MIN = 100
    e.HIGH_D = 32
    e.parallel_insert(pairs)
    assert e.choose_engine() == "scan"  # high-d

    f = AutoIndex(dist="Cosine")
    f.SCAN_MIN = 100
    f.parallel_insert(pairs)
    assert f.choose_engine() == "hnsw"  # large non-L2

    g = AutoIndex(dist="L2", engine="hnsw")
    g.parallel_insert(pairs[:10])
    assert g.choose_engine() == "hnsw"  # forced overrides size rule


def test_forced_engine_validation():
    with pytest.raises(ValueError):
        AutoIndex(engine="bogus")


def test_scan_engine_end_to_end(rng):
    X, pairs = _pairs(rng, 400, 24)
    a = AutoIndex(dist="L2")
    a.parallel_insert(pairs)
    res = a.search(X[7], 3, 32)
    assert res[0].d_id == 7
    ids, d = a.search_batch(X[:16], 5, 32)
    assert (ids[:, 0] == np.arange(16)).all()
    # filter delegates
    fres = a.search(X[7], 3, 64, filter=lambda i: i % 2 == 1)
    assert fres and all(r.d_id % 2 == 1 for r in fres)


def test_hnsw_engine_end_to_end(rng):
    X, pairs = _pairs(rng, 500, 16)
    a = AutoIndex(dist="L2", engine="hnsw", max_nb_connection=12,
                  ef_construction=100)
    a.parallel_insert(pairs)
    assert a.engine_name == "hnsw"
    assert isinstance(a.engine, Hnsw)
    res = a.search(X[3], 3, 48)
    assert res[0].d_id == 3
    fres = a.search_filter(X[3], 3, 64, filter=sorted(range(0, 500, 5)))
    assert fres and all(r.d_id % 5 == 0 for r in fres)


def test_insert_after_build(rng):
    X, pairs = _pairs(rng, 100, 8)
    a = AutoIndex(dist="L2")
    a.parallel_insert(pairs)
    a.build()
    a.insert(X[0] + 100.0, 1000)  # post-build inserts hit the engine
    assert len(a) == 101
    res = a.search(X[0] + 100.0, 1, 16)
    assert res[0].d_id == 1000


def test_annt_facade(rng, tmp_path=None):
    """AutoIndex implements the AnnT capability surface: parallel_search on
    both engines, file_dump on the graph engine, a clear error on the scan."""
    import tempfile
    from hnsw_tpu import AnnT
    X, pairs = _pairs(rng, 200, 12)
    a = AutoIndex(dist="L2")  # small corpus -> scan
    a.parallel_insert(pairs)
    assert isinstance(a, AnnT)
    rows = a.parallel_search(X[:5], 3, 16)
    assert len(rows) == 5 and rows[0][0].d_id == 0
    with pytest.raises(ValueError):
        a.file_dump("/tmp", "nope")
    g = AutoIndex(dist="L2", engine="hnsw", max_nb_connection=8,
                  ef_construction=48)
    g.parallel_insert(pairs)
    rows = g.parallel_search(X[:5], 3, 32)
    assert rows[0][0].d_id == 0
    with tempfile.TemporaryDirectory() as td:
        base = g.file_dump(td, "autodump")
        from hnsw_tpu import HnswIo
        r = HnswIo(td, base).load_hnsw()
        assert r.get_nb_point() == 200
