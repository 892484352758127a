"""Search perf/recall experiment harness (TPU worker job target).

Reloads a BENCH_SAVE native snapshot, regenerates the matching bench corpus +
fp64 ground truth (same seeds/method as bench.py), then times search_program
variants across an (ef, expand, max_iters, seeds, qbatch) grid. Reports, per
variant: fp64-scored recall@10, streamed QPS (3-stage pipeline, f16 ingest),
and kernel-rate QPS (device-resident queries, no tunnel).

Env knobs: EXP_SNAP (snapshot path), EXP_N, EXP_D, EXP_DATASET, EXP_GRID
(semicolon-separated "ef,expand,max_iters,seeds,qbatch" tuples; max_iters 0 =
default), EXP_BLOCKS (timed blocks per variant, default 5).

Run via the TPU worker: jobs exec this file from disk so it is always fresh.

CORPUS RECREATION HAZARD (round 5): snapshots carry the corpus as built; this
harness recreates X/Q from the seed. bench.make_dataset is corpus-stable across
nq only since the xrng/qrng fork fix — snapshots saved by the PRE-fix bench
with BENCH_QBATCH != 16384 recreate a DIFFERENT X here (the old X noise was
drawn after the nq-sized query draws) and score a fake ~3-point recall
regression. Regenerate such snapshots before trusting recall rows.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from hnsw_tpu import load_native
    from hnsw_tpu.ops.beam_search import device_search_stream, _search_program
    sys.path.insert(0, "/root/repo")
    import bench as benchmod

    N = int(os.environ.get("EXP_N", 1_000_000))
    d = int(os.environ.get("EXP_D", 128))
    NQ = 16384
    k = 10
    snap = os.environ.get("EXP_SNAP", "/tmp/idx1m.npz")
    rng = np.random.default_rng(1234)
    X, Q = benchmod.make_dataset(os.environ.get("EXP_DATASET", "gauss"), rng,
                                 N, NQ, d, int(os.environ.get("EXP_INTRINSIC", 16)))

    log(f"[exp] loading snapshot {snap}")
    h = load_native(snap)
    assert h.get_nb_point() == N, (h.get_nb_point(), N)

    # fp64 ground truth via TPU scan pool (bench.py method)
    from hnsw_tpu.ops.pallas_topk import pallas_l2_topk_stream, pad_corpus, pick_tn
    TN = pick_tn(d)
    Xp, xsqp, perm = pad_corpus(X, tn=TN)
    Xpd, xsqd = jnp.asarray(Xp), jnp.asarray(xsqp)
    Xscan = Xpd.astype(jnp.bfloat16)
    ACC = max(1, -(-(Xp.shape[0] // TN) // 8))
    NQ_GT = 4096
    GT_POOL = 64
    log("[exp] ground truth pool ...")
    _, pool_ids = pallas_l2_topk_stream(Q[:NQ_GT], Xpd, xsqd, GT_POOL, tn=TN,
                                        group=TN // 128, Xscan=Xscan, overfetch=8,
                                        acc=ACC, batch=2048, query_dtype=None)
    pool_ids = perm[np.clip(pool_ids, 0, N - 1)]
    kth = np.empty(NQ_GT)
    for b in range(NQ_GT):
        rows = X[pool_ids[b]].astype(np.float64)
        dv = rows - Q[b].astype(np.float64)
        kth[b] = np.sqrt(np.partition((dv * dv).sum(-1), k - 1)[k - 1])
    del Xpd, xsqd, Xscan

    def recall_fp64(origin_ids):
        ok = origin_ids >= 0
        safe = np.clip(origin_ids, 0, N - 1)
        hits = 0
        for b in range(NQ_GT):
            dv = X[safe[b]].astype(np.float64) - Q[b].astype(np.float64)
            d64 = np.sqrt((dv * dv).sum(-1))
            hits += int((ok[b] & (d64 <= kth[b] * (1.0 + 1e-6) + 1e-12)).sum())
        return hits / (NQ_GT * k)

    BLOCKS = int(os.environ.get("EXP_BLOCKS", 5))
    # spec: ef,expand,max_iters(0=default),seeds,qbatch[,pool(0=None)
    #       [,width(0=None)[,rerank(0=None — cap of the final exact f32 pass)]]]
    grid = os.environ.get(
        "EXP_GRID",
        "80,4,0,4,16384;80,4,18,4,16384;80,4,14,4,16384;64,4,0,4,16384;"
        "64,4,0,8,16384;96,4,16,4,16384")
    results = []
    for spec in grid.split(";"):
        parts = [int(x) for x in spec.split(",")]
        ef, expand, mi, seeds, qb = parts[:5]
        pool = parts[5] if len(parts) > 5 and parts[5] > 0 else None
        width = parts[6] if len(parts) > 6 and parts[6] > 0 else None
        rerank = parts[7] if len(parts) > 7 and parts[7] > 0 else None
        if getattr(h, "_codec_width", None) != width:
            h._codec_width = width  # width-capped traversal codec
            h._codec_cache = None   # cache is version-keyed; width isn't in it
        max_iters = mi if mi > 0 else None
        ids, _ = device_search_stream(h, Q[:NQ_GT], k, ef, batch=min(qb, NQ_GT),
                                      expand=expand, max_iters=max_iters,
                                      seeds=seeds, query_dtype="f16", pool=pool,
                                      rerank=rerank)
        oid = np.where(ids >= 0, h._origin[np.clip(ids, 0, h._nb_point - 1)], -1)
        rec = recall_fp64(oid)

        Qs = np.tile(Q, (max(1, (2 * qb) // len(Q)) * 2, 1))

        def once():
            device_search_stream(h, Qs, k, ef, batch=qb, expand=expand,
                                 max_iters=max_iters, seeds=seeds,
                                 query_dtype="f16", pool=pool, rerank=rerank)

        t0 = time.time(); once(); per = max(time.time() - t0, 1e-3)
        reps = max(1, int(np.ceil(2.0 / per)))
        samples = []
        for _ in range(BLOCKS):
            t0 = time.time()
            for _ in range(reps):
                once()
            samples.append(reps * len(Qs) / (time.time() - t0))
        qps = float(np.median(samples))
        spread = float((max(samples) - min(samples)) / qps)

        # kernel rate: queries resident on device, force one fetch at the end
        g = h.device_graph(); codec = h.device_codec()
        qd = jnp.asarray(Q[:qb].astype(np.float16))
        mi_eff = max_iters if max_iters is not None else max(8, ef // expand + 2)
        out = _search_program(g, qd, None, ef=ef, knbn=k, expand=expand,
                              use_mask=False, max_iters=mi_eff, codec=codec,
                              term_slack=1.0, rerank=rerank, pool=pool,
                              seeds=seeds)
        np.array(out[0])  # warm
        t0 = time.time()
        outs = [_search_program(g, qd, None, ef=ef, knbn=k, expand=expand,
                                use_mask=False, max_iters=mi_eff, codec=codec,
                                term_slack=1.0, rerank=rerank, pool=pool,
                                seeds=seeds) for _ in range(4)]
        np.array(outs[-1][0])
        kqps = 4 * qb / (time.time() - t0)
        row = dict(ef=ef, expand=expand, max_iters=mi_eff, seeds=seeds, qb=qb,
                   pool=pool, width=width, rerank=rerank, recall=round(rec, 4),
                   qps=round(qps, 1), spread=round(spread, 3),
                   kernel_qps=round(kqps, 1))
        results.append(row)
        log("[exp]", json.dumps(row))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
