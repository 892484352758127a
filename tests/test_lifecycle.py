"""Lifecycle: repeated build/drop cycles must not leak (analog of reference
``tests/deallocation_test.rs`` — its cycle-breaking Drop has no Python equivalent,
but the flat-array design must release cleanly under GC), plus the AnnT facade
contract."""

import gc

import numpy as np

from hnsw_tpu import Hnsw, AnnT, NativeHnsw


def test_repeated_build_drop(rng):
    import tracemalloc
    X = rng.random((300, 8)).astype(np.float32)
    pairs = list(zip(X, range(300)))

    def cycle():
        h = Hnsw(max_nb_connection=8, max_elements=300, ef_construction=40)
        h.parallel_insert(pairs, mode="serial")
        h.search(X[0], 3, 16)
        del h

    cycle()
    gc.collect()
    tracemalloc.start()
    base = tracemalloc.take_snapshot()
    for _ in range(5):
        cycle()
    gc.collect()
    now = tracemalloc.take_snapshot()
    growth = sum(s.size_diff for s in now.compare_to(base, "filename")
                 if s.size_diff > 0)
    tracemalloc.stop()
    # five full build/drop cycles of a ~10KB index should not accumulate memory
    assert growth < 8 * 1024 * 1024, f"leaked {growth} bytes over 5 cycles"


def test_native_drop_cycles(rng):
    X = rng.random((200, 8)).astype(np.float32)
    for _ in range(5):
        nh = NativeHnsw(max_nb_connection=8, max_elements=200, ef_construction=40)
        nh.parallel_insert(X, np.arange(200), n_threads=1)
        nh.search(X[0], 3, 16)
        del nh
    gc.collect()


def test_ann_facade_protocol():
    assert isinstance(Hnsw(max_nb_connection=8), AnnT)
    from hnsw_tpu import BruteForceIndex
    bf = BruteForceIndex()
    assert hasattr(bf, "insert") and hasattr(bf, "parallel_insert")
