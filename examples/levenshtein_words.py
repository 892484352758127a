"""Word search under Levenshtein distance — analog of the reference's
``examples/levensthein.rs``: a dictionary of random 5-letter words stored as u16
code points, searched with and without a sorted-id filter.

Levenshtein has no device kernel (data-dependent DP loop — documented host-only
deviation, SURVEY.md §7.3); the index runs the serial host path, exactly like the
reference's single-threaded example.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hnsw_tpu import Hnsw


def main():
    rng = np.random.default_rng(7)
    n_words, wlen, charset = 1000, 5, "abcdefghij"
    words = ["".join(charset[c] for c in rng.integers(0, len(charset), wlen))
             for _ in range(n_words - 1)]
    words.append("abcdj")  # the reference plants a known near-match

    h = Hnsw(max_nb_connection=15, max_elements=500_000, ef_construction=200,
             dist="Levenshtein", dtype=np.uint16)
    for i, w in enumerate(words):
        h.insert(np.array([ord(c) for c in w], np.uint16), i)

    query = np.array([ord(c) for c in "abcde"], np.uint16)
    id_filter = sorted(range(1, 100))  # reference: ids 1..99 pass

    print("========== search with filter")
    for r in h.search_filter(query, 10, 30, id_filter):
        print(f"Word: {words[r.d_id]!r} Id: {r.d_id} Distance: {r.distance:.1f}")
        assert r.d_id in id_filter
    print("========== search without filter")
    res = h.search(query, 10, 30)
    for r in res:
        print(f"Word: {words[r.d_id]!r} Id: {r.d_id} Distance: {r.distance:.1f}")
    assert any(words[r.d_id] == "abcdj" and r.distance <= 1.0 for r in res), \
        "planted near-match should be found"
    print("OK")


if __name__ == "__main__":
    main()
