"""Batched device search (jitted beam search) vs the serial oracle and brute force."""

import numpy as np
import pytest

from hnsw_tpu import Hnsw
from hnsw_tpu.ops.distances import get_metric


def _build(rng, n=600, d=16, metric="L2", M=16, efc=200):
    X = rng.random((n, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=M, max_elements=n, ef_construction=efc, dist=metric)
    for i, v in enumerate(X):
        h.insert(v, i)
    return h, X


def test_batched_matches_brute_force(rng):
    h, X = _build(rng)
    metric = get_metric("L2")
    Q = rng.random((32, X.shape[1])).astype(np.float32)
    ids, dists = h.search_batch(Q, knbn=10, ef=64)
    assert ids.shape == (32, 10)
    truth = metric.brute_force(Q, X)
    hits = 0
    for b in range(32):
        kth = np.sort(truth[b])[9]
        hits += int((dists[b] <= kth + 1e-6).sum())
    recall = hits / (32 * 10)
    assert recall >= 0.9, f"batched recall {recall}"
    # distances must be correct for returned ids
    for b in range(4):
        for j in range(10):
            if ids[b, j] >= 0:
                assert dists[b, j] == pytest.approx(truth[b, ids[b, j]], rel=1e-4, abs=1e-4)


def test_batched_close_to_serial(rng):
    h, X = _build(rng, n=400)
    Q = rng.random((16, X.shape[1])).astype(np.float32)
    ids, dists = h.search_batch(Q, knbn=5, ef=48)
    agree = 0
    for b in range(16):
        serial = {r.d_id for r in h.search(Q[b], 5, 48)}
        batched = {h.get_origin_id(int(i)) for i in ids[b] if i >= 0}
        agree += len(serial & batched)
    assert agree / (16 * 5) >= 0.9


def test_parallel_search_api(rng):
    h, X = _build(rng, n=300)
    Q = rng.random((8, X.shape[1])).astype(np.float32)
    answers = h.parallel_search(Q, 3, 32)
    assert len(answers) == 8
    for b, row in enumerate(answers):
        assert 1 <= len(row) <= 3
        assert row == sorted(row)
        serial = h.search(Q[b], 3, 32)
        assert row[0].d_id == serial[0].d_id or abs(row[0].distance - serial[0].distance) < 1e-4


def test_profiler_spans(rng):
    """The tracing subsystem: serving through the pipelined stream reports
    per-stage spans and query counters; disabled profiler stays empty."""
    from hnsw_tpu.utils.profiling import PROFILER, enable_profiling
    from hnsw_tpu.ops.beam_search import device_search_stream

    h, X = _build(rng, n=300)
    PROFILER.reset()
    ids0, _ = device_search_stream(h, X[:8], 3, 24, batch=8)
    assert PROFILER.report() == {}  # off by default: zero residue
    enable_profiling()
    try:
        ids, _ = device_search_stream(h, X[:64], 5, 32, batch=32)
        rep = PROFILER.report()
    finally:
        enable_profiling(False)
        PROFILER.reset()
    assert rep["counters"]["stream.queries"] == 64
    for k in ("stream.upload", "stream.dispatch", "stream.fetch",
              "search.stream"):
        assert rep[k]["calls"] >= 1, rep
    assert rep["stream.upload"]["total_s"] >= 0


def test_levenshtein_device_search(rng):
    """Levenshtein searches run through the batched DEVICE machinery (VERDICT
    r3 missing #2 / SURVEY §7 hard part — previously a silent serial
    fallback): device-mode parallel_search on u16 strings must agree with the
    serial host oracle."""
    from hnsw_tpu import Hnsw

    n, d = 240, 12
    X = rng.integers(1, 6, (n, d)).astype(np.uint16)  # small alphabet: ties
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48,
             dist="Levenshtein", dtype=np.uint16)
    h.parallel_insert([(X[i], i) for i in range(n)], mode="serial")
    Q = rng.integers(1, 6, (12, d)).astype(np.uint16)
    dev = h.parallel_search(Q, 5, 48, mode="device")
    ser = h.parallel_search(Q, 5, 48, mode="serial")
    agree = 0
    for brow_dev, brow_ser in zip(dev, ser):
        # edit distances tie heavily on a 5-symbol alphabet: compare by
        # distance multiset (the id sets legitimately differ within ties)
        dd = sorted(round(r.distance) for r in brow_dev)
        ds = sorted(round(r.distance) for r in brow_ser)
        agree += dd == ds
    assert agree >= 10, agree


def test_batched_filtered_search(rng):
    h, X = _build(rng, n=400)
    Q = rng.random((8, X.shape[1])).astype(np.float32)
    allowed = sorted(rng.choice(400, size=60, replace=False).tolist())
    ids, dists = h.search_batch(Q, knbn=5, ef=64, filter=allowed)
    metric = get_metric("L2")
    allowed_set = set(allowed)
    for b in range(8):
        got = [h.get_origin_id(int(i)) for i in ids[b] if i >= 0]
        assert all(g in allowed_set for g in got)
        assert len(got) >= 1
    # compare against a physically restricted brute force
    truth = metric.brute_force(Q, X[allowed])
    hits = 0
    for b in range(8):
        kth = np.sort(truth[b])[4]
        hits += int((dists[b][np.isfinite(dists[b])] <= kth + 1e-6).sum())
    assert hits / (8 * 5) >= 0.8


def test_batched_small_and_empty_index(rng):
    h = Hnsw(max_nb_connection=8, max_elements=8, ef_construction=16)
    ids, dists = h.search_batch(np.ones((3, 4), np.float32), 2, 8)
    assert (ids == -1).all()
    h.insert(np.ones(4, np.float32), 0)
    ids, dists = h.search_batch(np.ones((3, 4), np.float32), 2, 8)
    assert (ids[:, 0] == 0).all()
    assert np.allclose(dists[:, 0], 0, atol=1e-5)
    assert (ids[:, 1] == -1).all()


def test_batched_dot_metric(rng):
    from hnsw_tpu.ops.distances import l2_normalize
    n, d = 500, 24
    X = l2_normalize(rng.standard_normal((n, d)).astype(np.float32))
    h = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=200, dist="Dot")
    for i, v in enumerate(X):
        h.insert(v, i)
    Q = l2_normalize(rng.standard_normal((8, d)).astype(np.float32))
    ids, dists = h.search_batch(Q, 10, 64)
    truth = get_metric("Dot").brute_force(Q, X)
    hits = 0
    for b in range(8):
        kth = np.sort(truth[b])[9]
        hits += int((dists[b] <= kth + 1e-5).sum())
    assert hits / 80 >= 0.85


def test_traversal_codec_matches_exact(rng):
    """Forced i8 blocked-codec traversal + exact rerank returns (near-)identical
    results to the exact f32 path — ids equal on unambiguous neighbors, distances
    exact (the rerank re-scores against f32 vectors)."""
    n, d, k = 3000, 24, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((16, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=100, dist="L2")
    h.parallel_insert(list(zip(X, range(n))), mode="device", batch_size=512)

    h.set_traversal_codec(None)
    ids_e, d_e = h.search_batch(Q, k, 64)
    h.set_traversal_codec("i8")
    assert h.device_codec() is not None
    ids_c, d_c = h.search_batch(Q, k, 64)

    truth = get_metric("L2").brute_force(Q, X)
    hits_e = hits_c = 0
    for b in range(len(Q)):
        kth = np.sort(truth[b])[k - 1]
        hits_e += int((d_e[b] <= kth + 1e-5).sum())
        hits_c += int((d_c[b] <= kth + 1e-5).sum())
    # codec path must not lose recall (same graph, rerank is exact)
    assert hits_c >= hits_e - 2, (hits_c, hits_e)
    # distances the two paths agree on shared ids must match to f32 exactly
    common = ids_c[:, 0] == ids_e[:, 0]
    assert common.mean() >= 0.9
    np.testing.assert_allclose(d_c[common, 0], d_e[common, 0], rtol=1e-5)


def test_traversal_codec_auto_policy(rng):
    """auto -> off for small indexes, settable, and off for unsupported metrics."""
    n, d = 300, 8
    X = rng.random((n, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48, dist="L2")
    for i, v in enumerate(X):
        h.insert(v, i)
    assert h.device_codec() is None  # auto: below CODEC_MIN_POINTS
    h.set_traversal_codec("i8")
    c = h.device_codec()
    assert c is not None and c.blocks.dtype.name == "int8"
    ids, dists = h.search_batch(X[:4], 3, 16)
    assert (ids[:, 0] == np.arange(4)).all()
    h2 = Hnsw(max_nb_connection=8, max_elements=n, ef_construction=48,
              dist="Hamming", dtype=np.int32)
    h2.set_traversal_codec("i8")  # accepted, but unsupported metric -> None
    assert h2.device_codec() is None


def test_traversal_codec_width_cap(rng):
    """Width-capped codec: blocks shrink to the nearest-W links and the search
    traverses the identically sliced table. Capping drops the FARTHEST links
    (rows are ascending-distance), i.e. the long-range shortcuts, so recall
    degrades — measured -0.04 recall@10 at 1M with W=32 of 48 — which is why the
    cap is opt-in (memory-bound deployments), never the default. The test asserts
    the mechanics, not recall parity."""
    n, d, k = 3000, 24, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((16, d)).astype(np.float32)
    h = Hnsw(max_nb_connection=16, max_elements=n, ef_construction=100, dist="L2")
    h.set_keeping_pruned(True)
    h.parallel_insert(list(zip(X, range(n))), mode="device", batch_size=512)

    h.set_traversal_codec("i8")
    full = h.device_codec()
    ids_f, d_f = h.search_batch(Q, k, 64)
    W = 16
    h.set_traversal_codec("i8", width=W)
    capped = h.device_codec()
    assert capped.M0 == W
    assert capped.blocks.shape[1:] == (W, d)  # 3-D blocked store
    assert capped.nbytes < full.nbytes
    ids_c, d_c = h.search_batch(Q, k, 64)

    truth = get_metric("L2").brute_force(Q, X)
    hits_f = hits_c = 0
    for b in range(len(Q)):
        kth = np.sort(truth[b])[k - 1]
        hits_f += int((d_f[b] <= kth + 1e-5).sum())
        hits_c += int((d_c[b] <= kth + 1e-5).sum())
    # degraded but functional traversal; distances of agreeing ids stay exact
    assert hits_c >= int(0.5 * hits_f), (hits_c, hits_f)
    with pytest.raises(ValueError):
        h.set_traversal_codec("i8", width=0)


def test_pallas_codec_scores_kernel(rng):
    """The fused score kernel (interpret mode) matches the fp32 oracle for all
    three distance forms."""
    import jax.numpy as jnp
    from hnsw_tpu.ops.pallas_scores import pallas_codec_scores

    B, K, d = 16, 24, 32
    q = rng.standard_normal((B, d)).astype(np.float32)
    blk = rng.integers(-127, 128, (B, K * d)).astype(np.int8)
    scale = jnp.float32(0.017)
    bf = blk.reshape(B, K, d).astype(np.float32) * 0.017
    csq = (bf ** 2).sum(-1).astype(np.float32)
    qsq = (q ** 2).sum(-1, keepdims=True)
    qnorm = np.sqrt(qsq)
    ip = np.einsum("bd,bkd->bk", q, bf)

    out = pallas_codec_scores(jnp.asarray(q), jnp.asarray(blk), jnp.asarray(csq),
                              jnp.asarray(qsq), scale, form="l2", qt=8,
                              interpret=True)
    np.testing.assert_allclose(np.array(out),
                               np.sqrt(np.maximum(qsq - 2 * ip + csq, 0)),
                               rtol=1e-4, atol=1e-4)
    out = pallas_codec_scores(jnp.asarray(q), jnp.asarray(blk),
                              jnp.asarray(csq * 0), jnp.asarray(qsq), scale,
                              form="dot", qt=8, interpret=True)
    np.testing.assert_allclose(np.array(out), 1.0 - ip, rtol=1e-4, atol=1e-4)
    out = pallas_codec_scores(jnp.asarray(q), jnp.asarray(blk),
                              jnp.asarray(csq * 0), jnp.asarray(qnorm), scale,
                              form="cosine", qt=8, interpret=True)
    np.testing.assert_allclose(np.array(out), 1.0 - ip / qnorm, rtol=1e-4,
                               atol=1e-4)


def test_pallas_fused_scores_multislot(rng):
    """The fused gather+score kernel's DMA pipeline depth (``slots``) must not
    change results: slots 2/3/4 are bit-identical and match the fp32 oracle
    (interpret mode — the scratch-rotation/write-after-read spacing logic is
    what this guards, CPU-testable without a TPU)."""
    import jax.numpy as jnp
    from hnsw_tpu.ops.pallas_scores import pallas_fused_codec_scores

    B, E, M0, d, N = 16, 2, 8, 128, 64
    blocks = rng.integers(-5, 6, (N, M0, d)).astype(np.int8)
    q = rng.standard_normal((B, d)).astype(np.float32)
    qsn = (q * q).sum(-1, keepdims=True)
    src = rng.integers(0, N, (B, E)).astype(np.int32)
    scale = jnp.float32(0.1)
    outs = {}
    for slots in (2, 3, 4):
        outs[slots] = np.array(pallas_fused_codec_scores(
            jnp.asarray(src), jnp.asarray(q), jnp.asarray(qsn), scale,
            jnp.asarray(blocks), E, form="l2", qt=4, slots=slots,
            interpret=True))
    np.testing.assert_array_equal(outs[2], outs[3])
    np.testing.assert_array_equal(outs[2], outs[4])
    bf = blocks[src].astype(np.float32).reshape(B, E * M0, d) * 0.1
    ip = (bf * q[:, None, :]).sum(-1)
    csq = (bf * bf).sum(-1)
    np.testing.assert_allclose(outs[2],
                               np.sqrt(np.maximum(qsn - 2 * ip + csq, 0)),
                               rtol=1e-4, atol=1e-4)


def test_pallas_fused_scores_ids(rng):
    """The id-carrying fused kernel returns scores identical to the plain
    kernel's on the same vectors AND decodes the bitcast id rows back to the
    exact table rows (interpret mode; negative ids included — the -1 padding
    and real ids must round-trip the int32->int8->int32 bitcast)."""
    import jax.numpy as jnp
    import jax.lax as lax
    from hnsw_tpu.ops.pallas_scores import (pallas_fused_codec_scores,
                                            pallas_fused_codec_scores_ids)

    B, E, M0, d, N = 16, 2, 8, 128, 64
    blocks = rng.integers(-5, 6, (N, M0, d)).astype(np.int8)
    tbl = rng.integers(-1, N, (N, M0)).astype(np.int32)
    # id rows exactly as BeamCodec._build lays them out
    r_id = -(-(M0 + max(1, -(-(M0 * 4) // d))) // 8) * 8 - M0
    idcap = r_id * d // 4
    idp = np.full((N, idcap), -1, np.int32)
    idp[:, :M0] = tbl
    idbytes = np.asarray(lax.bitcast_convert_type(jnp.asarray(idp),
                                                  jnp.int8)).reshape(N, r_id, d)
    blocks_ext = np.concatenate([blocks, idbytes], axis=1)

    q = rng.standard_normal((B, d)).astype(np.float32)
    qsn = (q * q).sum(-1, keepdims=True)
    src = rng.integers(0, N, (B, E)).astype(np.int32)
    scale = jnp.float32(0.1)
    ref = np.array(pallas_fused_codec_scores(
        jnp.asarray(src), jnp.asarray(q), jnp.asarray(qsn), scale,
        jnp.asarray(blocks), E, form="l2", qt=4, interpret=True))
    sc, nbr = pallas_fused_codec_scores_ids(
        jnp.asarray(src), jnp.asarray(q), jnp.asarray(qsn), scale,
        jnp.asarray(blocks_ext), E, M0, form="l2", qt=4, interpret=True)
    np.testing.assert_array_equal(np.array(sc), ref)
    np.testing.assert_array_equal(np.array(nbr), tbl[src].reshape(B, E * M0))


def test_codec_id_rows_build(rng):
    """BeamCodec.build on an int8/lane-aligned graph carries id rows that
    decode back to the (8-padded) layer table; the beam search consuming them
    returns the same neighbors as a codec-free exact search."""
    import jax.numpy as jnp
    import jax.lax as lax
    from hnsw_tpu import Hnsw
    from hnsw_tpu.ops.graph_arrays import BeamCodec

    X = rng.standard_normal((300, 128)).astype(np.float32)
    h = Hnsw(max_nb_connection=8, max_elements=300, ef_construction=48,
             dist="L2")
    h.parallel_insert(X, mode="device", batch_size=64)
    g = h.device_graph()
    codec = BeamCodec.build(g, kind="i8")
    assert codec.M0 % 8 == 0
    assert codec.id_rows > 0
    assert codec.blocks.shape[1] == codec.M0 + codec.id_rows
    # decode the id rows and compare to the padded table
    idcap = codec.id_rows * codec.dim // 4
    raw = codec.blocks[:, codec.M0:, :].reshape(codec.blocks.shape[0], idcap, 4)
    ids = np.array(lax.bitcast_convert_type(raw, jnp.int32))[:, :codec.M0]
    tbl = np.array(g.layer_ids[0])
    want = np.full((tbl.shape[0], codec.M0), -1, np.int32)
    want[:, :min(codec.M0, tbl.shape[1])] = tbl[:, :codec.M0]
    np.testing.assert_array_equal(ids, want)


def test_pool_reservoir_large_k(rng):
    """The candidate pool decouples result width from beam width (VERDICT r2
    next #8): k=40 results served from a pool of 128 with a traversal beam of
    only ef=24 must match the recall of a wide-beam search, with no duplicate
    ids in any row."""
    from hnsw_tpu.ops.beam_search import device_search_batch
    h, X = _build(rng, n=800)
    metric = get_metric("L2")
    Q = rng.random((24, X.shape[1])).astype(np.float32)
    k = 40
    # same traversal budget with and without the reservoir: the pool retains
    # scored candidates the ef-wide beam evicts, so recall can only go up
    ids_p, d_p = device_search_batch(h, Q, k, 48, pool=128, max_iters=16)
    ids_w, d_w = device_search_batch(h, Q, k, 48, max_iters=16)
    truth = metric.brute_force(Q, X)
    hp = hw = 0
    for b in range(24):
        kth = np.sort(truth[b])[k - 1]
        hp += int((d_p[b][np.isfinite(d_p[b])] <= kth + 1e-6).sum())
        hw += int((d_w[b][np.isfinite(d_w[b])] <= kth + 1e-6).sum())
        live = ids_p[b][ids_p[b] >= 0]
        assert len(np.unique(live)) == len(live), "pool returned duplicate ids"
    assert hp / (24 * k) >= 0.9, f"pool recall {hp/(24*k)}"
    assert hp >= hw - 24, (hp, hw)  # narrow-beam+pool ~ wide-beam quality
    # distances are exact (pool path always reranks against f32 vectors)
    for b in range(4):
        for j in range(k):
            if ids_p[b, j] >= 0:
                assert d_p[b, j] == pytest.approx(truth[b, ids_p[b, j]],
                                                  rel=1e-4, abs=1e-4)


def test_pool_with_filter(rng):
    h, X = _build(rng, n=600)
    keep = np.arange(0, 600, 3)
    Q = rng.random((16, X.shape[1])).astype(np.float32)
    ids, dists = h.search_batch(Q, knbn=20, ef=24, filter=keep, pool=96)
    got = ids[ids >= 0]
    assert len(got)
    assert (h._origin[got] % 3 == 0).all(), "pool leaked filtered ids"


def test_pivot_start_matches_descent(rng, monkeypatch):
    """MXU pivot-start (brute-force scan of all level>=1 points) must serve the
    same results as the greedy-descent entry at equal-or-better recall."""
    import hnsw_tpu.ops.graph_arrays as ga
    h, X = _build(rng, n=800)
    metric = get_metric("L2")
    Q = rng.random((32, X.shape[1])).astype(np.float32)
    ids_d, dd = h.search_batch(Q, knbn=10, ef=64)  # descent entry (small graph)
    assert h.device_graph().pivot_ids is None
    monkeypatch.setattr(ga, "PIVOT_MIN_POINTS", 1)
    h._device_cache = None  # force re-snapshot with pivots
    g2 = h.device_graph()
    assert g2.pivot_ids is not None and g2.pivot_ids.shape[0] >= 8
    ids_p, dp = h.search_batch(Q, knbn=10, ef=64)
    truth = metric.brute_force(Q, X)
    hd = hp = 0
    for b in range(32):
        kth = np.sort(truth[b])[9]
        hd += int((dd[b] <= kth + 1e-6).sum())
        hp += int((dp[b] <= kth + 1e-6).sum())
    assert hp >= hd - 3, (hp, hd)  # pivot start: equal-or-better entry
    assert hp / 320 >= 0.9
    h._device_cache = None
