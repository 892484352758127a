"""Golden-bytes dump-format fixture: hand-assembled v4 bytes (tests/fixtures/
make_golden.py, built from SURVEY.md §2.5's documented layout, independent of both
writers) must load in BOTH tiers and be re-emitted byte-identically — guarding the
cross-tier format claim against shared wrong assumptions (VERDICT r1, weak #6)."""

import os
import shutil

import numpy as np
import pytest

from hnsw_tpu import HnswIo

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _bytes(path):
    with open(path, "rb") as f:
        return f.read()


def test_python_tier_parses_and_reemits_golden(tmp_path):
    h = HnswIo(FIX, "golden_v4").load_hnsw()
    assert h.get_nb_point() == 3
    assert h.get_distance_name() == "L2"
    assert h.max_nb_connection == 4
    assert sorted(h._origin[:3].tolist()) == [10, 20, 30]
    # entry is C (level 1)
    assert h.get_origin_id(h._entry) == 30
    assert h.get_point_id(h._entry) == (1, 0)
    # neighbor rows with the hand-computed distances
    iA = int(np.flatnonzero(h._origin[:3] == 10)[0])
    ids, dd = h.neighbour_row(iA, 0)
    assert [h.get_origin_id(int(j)) for j in ids] == [20, 30]
    np.testing.assert_allclose(dd, [1.0, 2.0], rtol=1e-6)
    # search through the loaded graph
    res = h.search(np.array([0.9, 0.1], np.float32), 1, 8)
    assert res[0].d_id == 20
    # byte-identical re-emission
    out = h.file_dump(tmp_path, "golden_v4")
    assert _bytes(tmp_path / "golden_v4.hnsw.graph") == _bytes(
        os.path.join(FIX, "golden_v4.hnsw.graph"))
    assert _bytes(tmp_path / "golden_v4.hnsw.data") == _bytes(
        os.path.join(FIX, "golden_v4.hnsw.data"))


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_tier_parses_and_reemits_golden(tmp_path):
    from hnsw_tpu.ffi import NativeHnsw, load_hnsw_description
    d = load_hnsw_description(FIX, "golden_v4")
    assert (d.format_version, d.dumpmode, d.max_nb_connection) == (4, 1, 4)
    assert (d.nb_point, d.dimension, d.t_name) == (3, 2, b"f32")
    nh = NativeHnsw.load(FIX, "golden_v4")
    assert len(nh) == 3
    ids, dd = nh.search(np.array([0.9, 0.1], np.float32), 1, 8)
    assert ids[0] == 20
    nh.file_dump(tmp_path, "golden_native")
    assert _bytes(tmp_path / "golden_native.hnsw.graph") == _bytes(
        os.path.join(FIX, "golden_v4.hnsw.graph"))
    assert _bytes(tmp_path / "golden_native.hnsw.data") == _bytes(
        os.path.join(FIX, "golden_v4.hnsw.data"))


def test_v2_bincode_reload_both_tiers():
    """Legacy format v2 (bincode data records) loads in both tiers and equals the
    v4 graph (reference reads v2, src/hnswio.rs:49-56,1156-1172)."""
    h2 = HnswIo(FIX, "golden_v2").load_hnsw()
    h4 = HnswIo(FIX, "golden_v4").load_hnsw()
    assert h2.check_graph_equality(h4)
    np.testing.assert_allclose(h2._data[:3], h4._data[:3])
    res = h2.search(np.array([0.9, 0.1], np.float32), 1, 8)
    assert res[0].d_id == 20
    if shutil.which("g++"):
        from hnsw_tpu.ffi import NativeHnsw
        nh = NativeHnsw.load(FIX, "golden_v2")
        assert len(nh) == 3
        ids, dd = nh.search(np.array([0.9, 0.1], np.float32), 1, 8)
        assert ids[0] == 20
