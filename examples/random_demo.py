"""Minimal smoke demo — analog of the reference's ``examples/random.rs`` (1k random
25-d vectors, insert + knn search): build on whichever backend is available, search,
dump, reload, verify."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hnsw_tpu import Hnsw, HnswIo


def main():
    rng = np.random.default_rng(0)
    n, d, k = 1000, 25, 10
    X = rng.random((n, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=200, dist="L2")
    h.parallel_insert(list(zip(X, range(n))))
    q = rng.random(d).astype(np.float32)
    for r in h.search(q, k, 32):
        print(f"  id {r.d_id:4d}  dist {r.distance:.4f}  p_id {r.p_id}")
    tmp = tempfile.mkdtemp()
    base = h.file_dump(tmp, "random_demo")
    r = HnswIo(tmp, base).load_hnsw()
    assert h.check_graph_equality(r)
    print(f"dump/reload OK -> {tmp}/{base}.hnsw.graph")


if __name__ == "__main__":
    main()
