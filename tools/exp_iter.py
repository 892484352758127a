"""Beam-iteration decomposition bench: where do the ms/iter go at 1M?

The eager micro-bench (exp_kernel.py) chains eager pallas calls — on axon each
eager dispatch is a tunnel round trip, so its per-call numbers carry ~5-10 ms
of dispatch overhead and are insensitive to kernel knobs. This harness times
each beam-iteration component CHAINED INSIDE ONE JIT (data dependence between
reps so XLA can't elide), on a real-scale [N, M0, d] int8 table:

  score : the fused gather+dequant+dot kernel (pallas_fused_codec_scores)
  merge : _merge_beam at [B, ef+K] (the sort-pair merge)
  masks : the in_beam/in_hist/dup comparison block
  body  : one full beam iteration for reference (via beam_search_layer unroll)

Env: IB (batch, 16384), IE (expand, 4), IM0 (56), ID (128), IN (1_000_001),
IEF (80), REPS (20), IQT (qt sweep "8,16,32"), ISLOTS ("2,4").
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps_outer=3):
    out = fn(*args)
    r = np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])  # compile+warm
    ts = []
    for _ in range(reps_outer):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])  # force
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from hnsw_tpu.ops.pallas_scores import pallas_fused_codec_scores
    from hnsw_tpu.ops.beam_search import _merge_beam

    B = int(os.environ.get("IB", 16384))
    E = int(os.environ.get("IE", 4))
    M0 = int(os.environ.get("IM0", 56))
    d = int(os.environ.get("ID", 128))
    N = int(os.environ.get("IN", 1_000_001))
    ef = int(os.environ.get("IEF", 80))
    REPS = int(os.environ.get("REPS", 20))
    K = E * M0
    H = K  # history width at the mi=22 operating point

    rng = np.random.default_rng(7)
    blocks = jax.jit(lambda k: lax.bitcast_convert_type(
        jax.random.bits(k, (N, M0, d), dtype=jnp.uint8), jnp.int8))(
            jax.random.PRNGKey(7))
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    qsn = (q * q).sum(-1)[:, None]
    scale = jnp.float32(0.01)
    src0 = jnp.asarray(rng.integers(0, N - 2, (B, E), dtype=np.int32))
    results = {}

    # ---- score kernel, chained with data dependence ----
    for qt in (int(x) for x in os.environ.get("IQT", "8,16").split(",")):
        for slots in (int(x) for x in os.environ.get("ISLOTS", "2,4").split(",")):
            @jax.jit
            def chain_score(src, q, qsn, scale, blocks, qt=qt, slots=slots):
                # Python unroll: in-kernel DMA inside lax.scan/while_loop hangs
                # the remote Mosaic pipeline (same reason beam_search_layer
                # unrolls its fused-kernel loop)
                acc = jnp.float32(0)
                for _ in range(REPS):
                    sc = pallas_fused_codec_scores(src, q, qsn, scale, blocks,
                                                   E, form="l2", qt=qt,
                                                   slots=slots)
                    # next src depends on sc (cheap): rotate by a data-derived bit
                    bump = (sc[:, :E] > 0).astype(jnp.int32)
                    src = (src + bump) % (N - 1)
                    acc = acc + sc[0, 0]
                return src, acc[None, None]

            try:
                t = timed(chain_score, src0, q, qsn, scale, blocks)
            except Exception as e:  # e.g. slots=8 exceeds the ~2 KB sflag
                # (DMA semaphore) scoped budget — record and keep sweeping
                log(f"[iter] score qt={qt} slots={slots} failed:",
                    repr(e)[:160])
                continue
            ms = t / REPS * 1e3
            row = dict(ms=round(ms, 3),
                       gbps=round(B * E * M0 * d / ms / 1e6, 1))
            results[f"score_qt{qt}_s{slots}"] = row
            log(f"[iter] score qt={qt} slots={slots}:", json.dumps(row))

    # ---- ids-carrying score kernel (the actual serving path since r4):
    # gathers scores AND the expanded nodes' neighbor ids in one DMA pass ----
    try:
        from hnsw_tpu.ops.pallas_scores import pallas_fused_codec_scores_ids
        del blocks  # 7.2 GB at 1M — both tables at once would brush HBM
        # id rows: RID*d bytes >= 4*M0, AND M0+RID 8-aligned (Mosaic slices
        # the [cap1, M0+RID, d] table along dim 1 in sublane-tile units — a
        # 58-row slice aborts with "must be aligned to tiling (8)"; the real
        # BeamCodec pads the same way)
        RID = max(1, -(-4 * M0 // d))
        RID += (-(M0 + RID)) % 8
        blocks3 = jax.jit(lambda k: lax.bitcast_convert_type(
            jax.random.bits(k, (N, M0 + RID, d), dtype=jnp.uint8), jnp.int8))(
                jax.random.PRNGKey(8))
        for qt in (int(x) for x in os.environ.get("IQT", "8,16").split(",")):
            for slots in (int(x) for x in
                          os.environ.get("ISLOTS", "2,4").split(",")):
                @jax.jit
                def chain_score_ids(src, q, qsn, scale, blocks3, qt=qt,
                                    slots=slots):
                    acc = jnp.float32(0)
                    for _ in range(REPS):
                        sc, nbr = pallas_fused_codec_scores_ids(
                            src, q, qsn, scale, blocks3, E, M0, form="l2",
                            qt=qt, slots=slots)
                        bump = (sc[:, :E] > 0).astype(jnp.int32)
                        src = (src + bump + (nbr[:, :E] & 1)) % (N - 1)
                        acc = acc + sc[0, 0]
                    return src, acc[None, None]

                try:
                    t = timed(chain_score_ids, src0, q, qsn, scale, blocks3)
                except Exception as e:
                    log(f"[iter] score_ids qt={qt} slots={slots} failed:",
                        repr(e)[:160])
                    continue
                ms = t / REPS * 1e3
                row = dict(ms=round(ms, 3),
                           gbps=round(B * E * (M0 + RID) * d / ms / 1e6, 1))
                results[f"score_ids_qt{qt}_s{slots}"] = row
                log(f"[iter] score_ids qt={qt} slots={slots}:", json.dumps(row))
        del blocks3
    except Exception as e:  # keep the rest of the decomposition alive
        log("[iter] score_ids skipped:", repr(e))

    # ---- merge, chained ----
    bd0 = jnp.sort(jnp.asarray(rng.standard_normal((B, ef)).astype(np.float32)), axis=1)
    bi0 = jnp.asarray(rng.integers(0, N - 2, (B, ef), dtype=np.int32))
    nd0 = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    ni0 = jnp.asarray(rng.integers(0, N - 2, (B, K), dtype=np.int32))

    @jax.jit
    def chain_merge(bi, bd, ni, nd):
        def step(carry, _):
            bi, bd = carry
            bi, bd = _merge_beam(bi, bd, ni, nd + bd[:, :1], ef)
            return (bi, bd), bd[0, 0]
        (bi, bd), _ = lax.scan(step, (bi, bd), None, length=REPS)
        return bi, bd

    t = timed(chain_merge, bi0, bd0, ni0, nd0)
    results["merge"] = dict(ms=round(t / REPS * 1e3, 3))
    log("[iter] merge:", json.dumps(results["merge"]))

    # ---- masks block, chained ----
    hist0 = jnp.asarray(rng.integers(0, N - 2, (B, H), dtype=np.int32))
    tri = (lax.broadcasted_iota(jnp.int32, (K, K), 1)
           < lax.broadcasted_iota(jnp.int32, (K, K), 0))

    @jax.jit
    def chain_masks(nbr, beam_ids, hist):
        def step(nbr, _):
            valid = nbr >= 0
            in_beam = (nbr[:, :, None] == beam_ids[:, None, :]).any(-1)
            in_hist = (nbr[:, :, None] == hist[:, None, :]).any(-1)
            eq = (nbr[:, :, None] == nbr[:, None, :]) & valid[:, None, :]
            dup = (eq & tri[None]).any(-1)
            valid = valid & ~in_beam & ~in_hist & ~dup
            return nbr + valid.astype(jnp.int32), valid[0, 0].astype(jnp.float32)
        nbr, _ = lax.scan(step, nbr, None, length=REPS)
        return nbr

    t = timed(chain_masks, ni0, bi0, hist0)
    results["masks"] = dict(ms=round(t / REPS * 1e3, 3))
    log("[iter] masks:", json.dumps(results["masks"]))

    # ---- neighbor-table row gather ([B,E] random rows of M0 i32) ----
    tbl = jnp.asarray(rng.integers(-1, N - 2, (N, M0), dtype=np.int32))

    @jax.jit
    def chain_tblgather(src):
        def step(src, _):
            nbr = tbl[jnp.clip(src, 0, N - 1)].reshape(B, K)
            return (src + (nbr[:, :E] > 0)) % (N - 1), nbr[0, 0]
        src, _ = lax.scan(step, src, None, length=REPS)
        return src

    t = timed(chain_tblgather, src0)
    results["tbl_gather"] = dict(ms=round(t / REPS * 1e3, 3))
    log("[iter] tbl_gather:", json.dumps(results["tbl_gather"]))

    # ---- top_k(E) frontier pick ----
    @jax.jit
    def chain_topk(bd):
        def step(bd, _):
            neg, pos = lax.top_k(-bd, E)
            return bd + neg[:, :1] * 1e-6, pos[0, 0]
        bd, _ = lax.scan(step, bd, None, length=REPS)
        return bd

    t = timed(chain_topk, bd0)
    results["topk_E"] = dict(ms=round(t / REPS * 1e3, 3))
    log("[iter] topk_E:", json.dumps(results["topk_E"]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
