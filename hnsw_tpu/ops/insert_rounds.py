"""Synchronized batched insertion rounds — the TPU build path.

The reference parallelizes insertion with rayon threads racing over per-point locks
(``parallel_insert``, reference ``src/hnsw.rs:1224-1238``), accepting run-to-run
nondeterminism from lock interleavings (``src/hnsw.rs:1222-1223``). The TPU-native
replacement is *synchronized rounds*: B points per round move through the full insert
pipeline as one jitted program —

  1. upper-layer greedy descent (ef=1) with the reference's "projection link"
     recording (``src/hnsw.rs:1114-1155``)
  2. per-layer beam search with ef_construction (batched ``search_layer``)
  3. vectorized heuristic neighbor selection (diversity prune of
     ``select_neighbours``, ``src/hnsw.rs:1299-1421``)
  4. forward-row writes, then a **deterministic sort-based reverse-link merge**
     replacing the reference's per-point lock mutation
     (``reverse_update_neighborhood_simple``, ``src/hnsw.rs:1241-1289``): all
     backlink edges of the round are deduped by (target, source), grouped by target
     via a radix-style double argsort, capped losslessly at the row width, and merged
     into existing rows by a single sorted truncation (top-width of a union equals the
     reference's sequential add-then-prune fold).

Points within a round do not see each other — the same contract the reference
documents for its thread races, but *deterministic* given (data order, batch size).

``extend_candidates`` (a layer-0 widening of the selection pool that the reference
only applies when fewer candidates than requested links exist,
``src/hnsw.rs:1317-1362``) runs as a ``lax.cond`` branch: the full round pays for the
widening gather only when at least one point in the round actually triggers it
(early rounds, sparse regions) — see ``extend_candidates_batched``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .beam_search import scores_gathered, beam_search_layer, greedy_min_descent

INF = jnp.float32(jnp.inf)


def _next_pow2(x: int) -> int:
    return 1 << (int(x) - 1).bit_length()


@dataclasses.dataclass(frozen=True)
class RoundConfig:
    """Static (hashable) per-round configuration; recompiles are bounded by the few
    distinct (max_obs, nonempty) values a build passes through."""

    B: int
    cap1: int
    num_layers: int
    widths: tuple  # per-layer row width
    efc: int
    M: int
    metric: str
    expand: int
    max_obs: int  # entry level at round start
    nonempty: tuple  # per-layer: did the layer contain points at round start
    keep_pruned: bool
    extend: bool = False  # reference extend_candidates (src/hnsw.rs:1317-1362)
    # upper-layer work runs on the first B1 rows only — the host sorts each round's
    # batch by level descending, so points with level >= 1 (an ~1/ln(M) fraction)
    # occupy a small static prefix instead of dragging full-width beams through
    # every upper layer. B1 == 0 skips upper construction entirely.
    B1: int = 0
    # construction-beam iteration cap (None = beam_search_layer's generous
    # default, (4*efc)//expand + 32). The round's while_loop runs until EVERY
    # point's beam terminates — one straggler in a 4096-point round drags all
    # of it, so a tuned cap trades the stragglers' last candidates for round
    # wall-clock. Set via device_parallel_insert(build_max_iters=...).
    max_iters: Optional[int] = None
    # Build-time in-degree guarantee at layer 0 (VERDICT r4 next #2): when the
    # round threads an ``indeg0`` array, each new point's ``min_indeg`` nearest
    # backlink edges are PROTECTED from merge truncation, and an existing row
    # entry whose target has <= min_indeg in-links is protected from eviction
    # ("never evict a last in-link"). This moves the reachability/in-degree
    # guarantee from the post-hoc host BFS (``Hnsw.ensure_navigable`` — 614 s
    # budget-capped at 200k clustered) into the rounds themselves, where the
    # diversity prune starves in-degree in the first place (reference has the
    # identical failure and no fix: src/hnsw.rs:1365-1395, measured 0.28
    # recall @ ef=512 on the clustered family).
    min_indeg: int = 2


# ----------------------------------------------------------- neighbor selection ------

def _pairwise_dists(metric: str, cvecs, csq):
    """[B,K,d] -> [B,K,K] candidate-candidate distances for the diversity prune."""
    if metric in ("L2", "DistL2"):
        g = jnp.einsum("bkd,bjd->bkj", cvecs, cvecs)
        return jnp.sqrt(jnp.maximum(csq[:, :, None] - 2.0 * g + csq[:, None, :], 0.0))
    if metric in ("Dot", "DistDot"):
        return 1.0 - jnp.einsum("bkd,bjd->bkj", cvecs, cvecs)
    if metric in ("Cosine", "DistCosine"):
        nrm = jnp.sqrt(jnp.maximum(csq, 1e-20))
        u = cvecs / nrm[:, :, None]
        return 1.0 - jnp.einsum("bkd,bjd->bkj", u, u)
    # generic metrics: chunked rows through the gathered-score kernel
    K = cvecs.shape[1]
    chunk = max(1, min(K, (1 << 22) // max(1, K * cvecs.shape[2])))
    outs = []
    for s in range(0, K, chunk):
        blk = cvecs[:, s: s + chunk]  # [B,c,d]
        Bc = blk.shape[0] * blk.shape[1]
        got = scores_gathered(metric, blk.reshape(Bc, -1),
                              jnp.repeat(cvecs, blk.shape[1], axis=0).reshape(Bc, K, -1))
        outs.append(got.reshape(blk.shape[0], blk.shape[1], K))
    return jnp.concatenate(outs, axis=1)


def select_neighbours_batched(metric: str, vectors, sqnorms, cand_ids, cand_d,
                              nb_conn: int, keep_pruned: bool, k_sel: Optional[int] = None):
    """Vectorized Navarro heuristic (reference ``select_neighbours``,
    ``src/hnsw.rs:1299-1421``): walk candidates nearest-first, keep e only if no
    already-kept d has dist(e,d) <= dist(e,q); optionally refill from pruned.
    Candidates beyond ``k_sel`` are never kept (prune window cap — they are examined
    by the reference but essentially never survive). Returns ([B,nb_conn] ids -1-pad,
    dists) sorted ascending."""
    B, C = cand_ids.shape
    K = min(C, k_sel if k_sel is not None else max(2 * nb_conn, 128))
    ids = cand_ids[:, :K]
    dd = cand_d[:, :K]
    valid = ids >= 0
    cap1 = vectors.shape[0]
    safe = jnp.clip(ids, 0, cap1 - 1)
    cvecs = vectors[safe]
    csq = sqnorms[safe]
    P = _pairwise_dists(metric, cvecs, csq)
    n_valid = (cand_ids >= 0).sum(1)
    keep_all = n_valid <= nb_conn  # reference short-circuit transfer (src/hnsw.rs:1318-1331)

    def body(k, carry):
        kept, count = carry
        conflict = (kept & (P[:, k, :] <= dd[:, k, None])).any(-1)
        take = valid[:, k] & (count < nb_conn) & ~conflict
        return kept.at[:, k].set(take), count + take

    kept, count = lax.fori_loop(0, K, body,
                                (jnp.zeros((B, K), bool), jnp.zeros((B,), jnp.int32)))
    if keep_pruned:
        disc = valid & ~kept
        room = (nb_conn - count)[:, None]
        refill = disc & (jnp.cumsum(disc, axis=1) <= room)
        kept = kept | refill
    kept = jnp.where(keep_all[:, None], valid, kept)
    # compact, preserving ascending-distance order
    posn = jnp.where(kept, jnp.arange(K)[None, :], K + 1)
    order = jnp.argsort(posn, axis=1)[:, :nb_conn]
    okay = jnp.take_along_axis(kept, order, 1)
    sel_ids = jnp.where(okay, jnp.take_along_axis(ids, order, 1), -1)
    sel_d = jnp.where(okay, jnp.take_along_axis(dd, order, 1), INF)
    return sel_ids, sel_d


def extend_candidates_batched(metric: str, vectors, sqnorms, tbl0, q, cand_ids,
                              cand_d, nb_conn: int, act, k_out: int):
    """Layer-0 candidate-pool widening (reference ``select_neighbours`` extension,
    ``src/hnsw.rs:1317-1362``): a point whose beam returned <= ``nb_conn`` candidates
    adds every layer-0 neighbour of those candidates to its pool, scored against the
    query, before the diversity prune. The reference dedups via a HashMap; here the
    merged pool is sorted by (id, distance) so duplicates (which share an exact
    distance) become adjacent and are masked, then re-sorted by distance.

    The whole widening executes under ``lax.cond`` — rounds where no point triggers
    (the common case once the graph outgrows ef_construction) skip it entirely.

    Returns ([B, k_out] ids -1-padded, dists) sorted ascending.
    """
    B, C = cand_ids.shape
    cap1, M0 = tbl0.shape
    W = min(C, nb_conn)  # triggering points have <= nb_conn candidates
    P = W * M0

    n_valid = (cand_ids >= 0).sum(1)
    need = act & (n_valid <= nb_conn)

    def widen(_):
        src = cand_ids[:, :W]
        nb = tbl0[jnp.clip(src, 0, cap1 - 1)].reshape(B, P)
        ok = need[:, None] & jnp.repeat(src >= 0, M0, axis=1) & (nb >= 0)
        # score the pool in chunks to bound the [B, chunk, d] gather temporaries
        chunk = max(M0, min(P, (1 << 21) // max(1, q.shape[1])))
        scs = []
        for s in range(0, P, chunk):
            blk = jnp.where(ok[:, s:s + chunk], nb[:, s:s + chunk], cap1 - 1)
            scs.append(scores_gathered(metric, q, vectors[blk], sqnorms[blk]))
        sc = jnp.where(ok, jnp.concatenate(scs, axis=1), INF)
        m_ids = jnp.concatenate([jnp.where(cand_ids >= 0, cand_ids, cap1),
                                 jnp.where(ok, nb, cap1)], axis=1)
        m_d = jnp.concatenate([cand_d, sc], axis=1)
        # dedup by id ADJACENCY: sort by distance bits first, then STABLE sort
        # by id — copies of the same id are then adjacent (ascending distance
        # within the id run) no matter how far apart their distances are. The
        # previous scheme (id sort, then distance sort, adjacency check) only
        # caught duplicates whose two distance values were bit-identical; the
        # beam's [B,E*M,d] einsum and this widen pass's chunked einsum can
        # disagree by 1 ulp on the same pair, leaving the node in the pool
        # twice. (Bitcast ordering of negative Dot distances is imperfect but
        # only picks WHICH ~equal copy of a duplicate survives.)
        dbits = lax.bitcast_convert_type(
            jnp.where(m_ids < cap1, m_d, INF), jnp.int32)
        o0 = jnp.argsort(dbits, axis=1, stable=True)
        i0 = jnp.take_along_axis(m_ids, o0, 1)
        d0 = jnp.take_along_axis(m_d, o0, 1)
        o1 = jnp.argsort(jnp.where(i0 < cap1, i0, cap1), axis=1, stable=True)
        i1 = jnp.take_along_axis(i0, o1, 1)
        d1 = jnp.take_along_axis(d0, o1, 1)
        dup = jnp.concatenate([jnp.zeros((B, 1), bool), i1[:, 1:] == i1[:, :-1]], 1)
        live = (i1 < cap1) & ~dup
        neg, o3 = lax.top_k(jnp.where(live, -d1, -INF), k_out)
        out_ids = jnp.take_along_axis(jnp.where(live, i1, -1), o3, 1)
        return jnp.where(neg > -INF, out_ids, -1), -neg

    def passthrough(_):
        k = min(k_out, C)
        ids = cand_ids[:, :k]
        dd = cand_d[:, :k]
        if k < k_out:
            ids = jnp.concatenate([ids, jnp.full((B, k_out - k), -1, jnp.int32)], 1)
            dd = jnp.concatenate([dd, jnp.full((B, k_out - k), INF)], 1)
        return ids, dd

    return lax.cond(need.any(), widen, passthrough, jnp.int32(0))


# ------------------------------------------------------------- reverse-link merge ----

def _reverse_merge(tbl_ids, tbl_d, eq, esrc, ed, valid, width: int,
                   indeg=None, eprot=None, min_indeg: int = 2):
    """Deterministically merge backlink edges (target q <- source src at dist d) into
    the target rows of one layer table. Lossless: top-width of (existing ∪ incoming)
    equals the reference's sequential add+prune fold.

    In-degree guarantee (layer-0 calls; ``indeg``/``eprot`` set — see
    ``RoundConfig.min_indeg``): an incoming edge flagged in ``eprot`` (a
    source's ``min_indeg`` nearest targets) survives both truncations ahead of
    any closer unprotected entry, and an EXISTING entry whose target currently
    has <= ``min_indeg`` in-links is likewise protected from eviction. Rows
    stay distance-sorted (survivors are re-sorted by true distance), so only
    WHICH entries survive changes. Returns (ids, dists) — plus the updated
    ``indeg`` array when one was given."""
    E = eq.shape[0]
    cap1 = tbl_ids.shape[0]
    sink = cap1 - 1
    protecting = indeg is not None
    qv = eq.astype(jnp.int32)
    sv = esrc.astype(jnp.int32)
    pr = (eprot if eprot is not None else jnp.zeros((E,), bool)) & valid
    # Lexicographic orderings via chained STABLE argsorts (int64 keys are unavailable
    # without x64 mode). Invalid edges get q = cap1 so they sort last.
    # 1. dedup (q, src) — reference's `already` check (src/hnsw.rs:1258-1267)
    p_a = jnp.argsort(jnp.where(valid, sv, cap1), stable=True)
    q_a, s_a, d_a, v_a, pr_a = qv[p_a], sv[p_a], ed[p_a], valid[p_a], pr[p_a]
    p_b = jnp.argsort(jnp.where(v_a, q_a, cap1), stable=True)
    q_b, s_b, d_b, v_b, pr_b = (q_a[p_b], s_a[p_b], d_a[p_b], v_a[p_b],
                                pr_a[p_b])
    dup = jnp.concatenate([jnp.zeros((1,), bool),
                           (q_b[1:] == q_b[:-1]) & (s_b[1:] == s_b[:-1])])
    v2 = v_b & ~dup
    # 2. group by target, ascending distance: stable sort by distance bits, then by q
    # (distances are >= 0, so their f32 bit patterns sort correctly as int32).
    # Protected edges take a -2^30 key offset (bits are halved first so the
    # offset cannot collide with any unprotected key): they sort FIRST within
    # their target group and therefore survive the per-target rank<width cap.
    dbits = lax.bitcast_convert_type(jnp.where(v2, d_b, jnp.inf).astype(jnp.float32),
                                     jnp.int32)
    dkey = (dbits >> 1) - jnp.int32(1 << 30) * (pr_b & v2)
    p_c = jnp.argsort(dkey, stable=True)
    q_c, s_c, d_c, v_c, pr_c = (q_b[p_c], s_b[p_c], d_b[p_c], v2[p_c],
                                pr_b[p_c])
    p_d = jnp.argsort(jnp.where(v_c, q_c, cap1), stable=True)
    q3, s3, d3, v3, pr3 = q_c[p_d], s_c[p_d], d_c[p_d], v_c[p_d], pr_c[p_d]
    idx = jnp.arange(E)
    newq = jnp.concatenate([jnp.ones((1,), bool), q3[1:] != q3[:-1]])
    first = v3 & newq
    slot = jnp.cumsum(first) - 1  # group slot per edge
    seg_start = lax.cummax(jnp.where(first, idx, -1))
    rank = idx - seg_start
    keep = v3 & (rank < width)
    # 3. dense incoming table [E+1, width] (row E is the spill for dropped edges)
    r_slot = jnp.where(keep, slot, E)
    r_rank = jnp.where(keep, jnp.clip(rank, 0, width - 1), 0)
    inc_ids = jnp.full((E + 1, width), -1, jnp.int32).at[r_slot, r_rank].set(
        jnp.where(keep, s3, -1).astype(jnp.int32))
    inc_d = jnp.full((E + 1, width), jnp.inf, jnp.float32).at[r_slot, r_rank].set(
        jnp.where(keep, d3, jnp.inf).astype(jnp.float32))
    tq = jnp.full((E + 1,), sink, jnp.int32).at[jnp.where(first, slot, E)].set(
        jnp.where(first, q3, sink).astype(jnp.int32))
    # 4. merge with existing rows: sort by (protection, distance), truncate to
    # width, then re-sort survivors by true distance (bitcast keys would
    # mis-order negative Dot distances; lax.sort on the float keeps rows exact)
    ex_ids = tbl_ids[tq]
    ex_d = jnp.where(ex_ids < 0, jnp.inf, tbl_d[tq])
    m_ids = jnp.concatenate([ex_ids, inc_ids], axis=1)
    m_d = jnp.concatenate([ex_d, inc_d], axis=1)
    if protecting:
        inc_prot = jnp.zeros((E + 1, width), bool).at[r_slot, r_rank].set(
            keep & pr3)
        ex_prot = (ex_ids >= 0) & (indeg[jnp.clip(ex_ids, 0, cap1 - 1)]
                                   <= min_indeg)
        # unprotected first key 1, protected 0 -> protected sort ahead at equal
        # float distance AND survive the [:width] truncation over any closer
        # unprotected entry (num_keys=2 lexicographic)
        m_unprot = 1 - jnp.concatenate([ex_prot, inc_prot], axis=1).astype(
            jnp.int32)
        _, m_d, m_ids = lax.sort((m_unprot, m_d, m_ids), dimension=1,
                                 num_keys=2)
        m_ids = m_ids[:, :width]
        m_d = m_d[:, :width]
        m_d, m_ids = lax.sort((m_d, m_ids), dimension=1, num_keys=1)
    else:
        order = jnp.argsort(m_d, axis=1)[:, :width]
        m_ids = jnp.take_along_axis(m_ids, order, 1)
        m_d = jnp.take_along_axis(m_d, order, 1)
    m_ids = jnp.where(jnp.isfinite(m_d), m_ids, -1)
    out_ids, out_d = tbl_ids.at[tq].set(m_ids), tbl_d.at[tq].set(m_d)
    if not protecting:
        return out_ids, out_d
    # maintain the global layer-0 in-degree: -1 per surviving BEFORE entry,
    # +1 per surviving AFTER entry, on real (non-spill) rows only — the sink
    # row is dead storage no search traverses, so its contents don't count
    live = (tq != sink)[:, None]
    indeg = indeg.at[jnp.clip(ex_ids, 0, cap1 - 1)].add(
        -(live & (ex_ids >= 0)).astype(jnp.int32))
    indeg = indeg.at[jnp.clip(m_ids, 0, cap1 - 1)].add(
        (live & (m_ids >= 0)).astype(jnp.int32))
    return out_ids, out_d, indeg


# ------------------------------------------------------------------- round step ------

def round_step(vectors, sqnorms, levels, tables, batch_ids, entry,
               vectors_lo=None, indeg0=None, *, cfg: RoundConfig):
    """One synchronized insertion round. ``tables`` is a tuple of (ids, dists) per
    layer; donated and returned updated. When ``indeg0`` (a [cap1] int32
    layer-0 in-degree array) is threaded, the layer-0 merge runs with the
    in-degree guarantee (see ``RoundConfig.min_indeg``) and the return value is
    ``(tables, indeg0)``; otherwise just ``tables`` (legacy callers).

    ``vectors_lo``: optional bfloat16 copy of ``vectors`` used ONLY for beam
    traversal scoring (the [B, K, d] candidate gathers are the round's dominant
    HBM traffic; bf16 halves it and the inner products run on the MXU with f32
    accumulation). Neighbor *selection* (the diversity prune) and its pairwise
    distances stay f32 — link-list contents shift only where bf16 rounding
    (~0.4%) flips a near-tie in the beam's candidate ranking."""
    metric = cfg.metric
    cap1 = cfg.cap1
    sink = cap1 - 1
    L = cfg.num_layers
    ids_t = [t[0] for t in tables]
    d_t = [t[1] for t in tables]
    vtrav = vectors_lo if vectors_lo is not None else vectors
    q = vectors[batch_ids]

    def rescore_exact(qv, cand_ids, cand_d):
        """bf16 traversal keeps the SEARCH cheap, but its distances mis-rank
        near-ties — and on tie-dense (clustered) corpora the neighbor
        selection's inputs being off by bf16 rounding corrupts the stored
        link structure (measured: 200k clustered recall 0.86 @ ef=512 with
        raw bf16 candidates vs 0.98-class with exact selection inputs). One
        [B, efc] f32 gather+re-sort per layer restores exact selection
        semantics for ~1/50th of the traffic the bf16 traversal saves."""
        if vectors_lo is None:
            return cand_ids, cand_d
        safe = jnp.clip(cand_ids, 0, cap1 - 1)
        sc = scores_gathered(metric, qv, vectors[safe], sqnorms[safe])
        sc = jnp.where(cand_ids >= 0, sc, jnp.inf)
        sd, si = jax.lax.sort((sc, cand_ids), dimension=1, num_keys=1)
        return si, sd
    lv = levels[batch_ids]
    alive = lv >= 0
    B = cfg.B
    # distance to entry
    d0 = scores_gathered(metric, q, jnp.broadcast_to(vectors[entry][None, None, :],
                                                     (B, 1, q.shape[1])),
                         jnp.broadcast_to(sqnorms[entry][None, None], (B, 1)))[:, 0]
    pivot = jnp.broadcast_to(entry, (B,)).astype(jnp.int32)

    # 1. upper-layer ef=1 descent with projection recording
    recs = []

    def rec_hook(layer, p, dd, act):
        recs.append((layer, p, dd, act))
        return None

    desc_tables = [ids_t[l] if (l < L and cfg.nonempty[l]) else None for l in range(L)]
    # greedy_min_descent skips layers >= len(layer_ids); feed only nonempty layers
    pivot, d0, _ = greedy_min_descent(
        metric, vtrav, sqnorms,
        [t if t is not None else jnp.full((cap1, 1), -1, jnp.int32) for t in desc_tables],
        q, pivot, d0, top_layer=cfg.max_obs, stop_level=lv, record_hook=rec_hook)
    # projection links (reference src/hnsw.rs:1140-1148): the nearest point found at
    # each traversed upper layer is recorded in the new point's row at that layer
    for (layer, p, dd, act) in recs:
        if layer >= L or not cfg.nonempty[layer]:
            continue
        a = act & alive
        tgt = jnp.where(a, batch_ids, sink)
        ids_t[layer] = ids_t[layer].at[tgt, 0].set(jnp.where(a, p, -1))
        d_t[layer] = d_t[layer].at[tgt, 0].set(jnp.where(a, dd, jnp.inf))

    # 2-4. construction loop, layers high..0. Upper layers (l >= 1) run on the sorted
    # B1-prefix (all level>=1 points of the round); layer 0 runs on the full batch.
    B1 = cfg.B1
    sel_upper = [None] * L  # per upper layer: ([B1,w] ids, dists, act)
    for l in range(L - 1, 0, -1):
        if not cfg.nonempty[l] or B1 == 0:
            continue
        act_l = alive[:B1] & (lv[:B1] >= l)
        cand_ids, cand_d = beam_search_layer(metric, vtrav, sqnorms, ids_t[l],
                                             q[:B1], pivot[:B1], d0[:B1],
                                             ef=cfg.efc, expand=cfg.expand,
                                             active=act_l,
                                             max_iters=cfg.max_iters)
        cand_ids, cand_d = rescore_exact(q[:B1], cand_ids, cand_d)
        nb_conn = cfg.widths[l]
        sel_ids, sel_d = select_neighbours_batched(metric, vectors, sqnorms, cand_ids,
                                                   cand_d, nb_conn, cfg.keep_pruned)
        tgt = jnp.where(act_l, batch_ids[:B1], sink)
        ids_t[l] = ids_t[l].at[tgt].set(jnp.where(act_l[:, None], sel_ids, -1))
        d_t[l] = d_t[l].at[tgt].set(jnp.where(act_l[:, None], sel_d, jnp.inf))
        sel_upper[l] = (sel_ids, sel_d, act_l)
        has = act_l & jnp.isfinite(sel_d[:, 0])
        pivot = jnp.concatenate([jnp.where(has, sel_ids[:, 0], pivot[:B1]), pivot[B1:]])
        d0 = jnp.concatenate([jnp.where(has, sel_d[:, 0], d0[:B1]), d0[B1:]])
    sel0 = None
    if cfg.nonempty[0]:
        act0 = alive
        cand_ids, cand_d = beam_search_layer(metric, vtrav, sqnorms, ids_t[0], q,
                                             pivot, d0, ef=cfg.efc, expand=cfg.expand,
                                             active=act0, max_iters=cfg.max_iters)
        cand_ids, cand_d = rescore_exact(q, cand_ids, cand_d)
        nb_conn = cfg.widths[0]  # 2M at layer 0 (reference src/hnsw.rs:1177-1182)
        if cfg.extend:  # reference applies extension at layer 0 only (src/hnsw.rs:1176-1183)
            k_win = min(cand_ids.shape[1], max(2 * nb_conn, 128))
            cand_ids, cand_d = extend_candidates_batched(
                metric, vectors, sqnorms, ids_t[0], q, cand_ids, cand_d, nb_conn,
                act0, k_out=k_win)
        sel_ids, sel_d = select_neighbours_batched(metric, vectors, sqnorms, cand_ids,
                                                   cand_d, nb_conn, cfg.keep_pruned)
        tgt = jnp.where(act0, batch_ids, sink)
        ids_t[0] = ids_t[0].at[tgt].set(jnp.where(act0[:, None], sel_ids, -1))
        d_t[0] = d_t[0].at[tgt].set(jnp.where(act0[:, None], sel_d, jnp.inf))
        sel0 = (sel_ids, sel_d, act0)
        if indeg0 is not None:
            # forward rows of the round's points create in-links to their
            # selected (established) neighbors; the rows themselves were empty
            # (round points are fresh), so the delta is purely additive
            fok = act0[:, None] & (sel_ids >= 0)
            indeg0 = indeg0.at[jnp.clip(sel_ids, 0, cap1 - 1)].add(
                fok.astype(jnp.int32))

    # 5. reverse-link merge, grouped by target layer l_n = new point's level.
    # Sources with level 0 only contribute their layer-0 row (merged into layer 0);
    # level>=1 sources (all inside the B1 prefix) contribute rows from every layer
    # they were constructed at, merged into their own level's table.
    if sel0 is not None:
        sids, sd, act0 = sel0
        ev0 = (sids >= 0) & act0[:, None] & (lv == 0)[:, None]
        eq0 = sids.reshape(-1)
        ed0 = sd.reshape(-1)
        es0 = jnp.broadcast_to(batch_ids[:, None], sids.shape).reshape(-1)
        v0 = (ev0.reshape(-1)) & (eq0 != es0)
        if indeg0 is None:
            ids_t[0], d_t[0] = _reverse_merge(ids_t[0], d_t[0], eq0, es0, ed0,
                                              v0, cfg.widths[0])
        else:
            # each source's min_indeg NEAREST backlink edges are protected
            # (sel rows are distance-sorted, so protection == column rank):
            # every fresh point leaves its round with >= min_indeg in-links
            ep0 = jnp.broadcast_to(
                jnp.arange(sids.shape[1])[None, :] < cfg.min_indeg,
                sids.shape).reshape(-1)
            ids_t[0], d_t[0], indeg0 = _reverse_merge(
                ids_t[0], d_t[0], eq0, es0, ed0, v0, cfg.widths[0],
                indeg=indeg0, eprot=ep0, min_indeg=cfg.min_indeg)
    if B1 > 0:
        parts = []
        if sel0 is not None:
            sids, sd, _ = sel0
            parts.append((sids[:B1], sd[:B1]))
        for l in range(1, L):
            if sel_upper[l] is not None:
                parts.append((sel_upper[l][0], sel_upper[l][1]))
        if parts:
            eq = jnp.concatenate([p[0] for p in parts], axis=1)  # [B1, TOT]
            edd = jnp.concatenate([p[1] for p in parts], axis=1)
            esrc = jnp.broadcast_to(batch_ids[:B1, None], eq.shape)
            elv = jnp.broadcast_to(lv[:B1, None], eq.shape)
            eq, edd, esrc, elv = (x.reshape(-1) for x in (eq, edd, esrc, elv))
            ev = (eq >= 0) & (eq != esrc)
            for l_n in range(1, L):
                v_ln = ev & (elv == l_n)
                ids_t[l_n], d_t[l_n] = _reverse_merge(ids_t[l_n], d_t[l_n], eq, esrc,
                                                      edd, v_ln, cfg.widths[l_n])
    out = tuple((i, d) for i, d in zip(ids_t, d_t))
    return out if indeg0 is None else (out, indeg0)


_round_step = partial(jax.jit, static_argnames=("cfg",),
                      donate_argnums=(3, 7))(round_step)


# ------------------------------------------------------------------ host driver ------

class HostBuildState:
    """Host-side bookkeeping for one index's device build: allocates the new points'
    host rows, materializes the numpy device-state arrays, schedules rounds, and
    flushes device tables back into the ``Hnsw``. Shared by the single-chip driver
    (``device_parallel_insert``) and the mesh data-parallel driver
    (``parallel.sharded.ShardedHnsw``), which stacks one state per shard."""

    def __init__(self, hnsw, pairs, L: Optional[int] = None,
                 widths: Optional[tuple] = None, cap1: Optional[int] = None):
        self.hnsw = hnsw
        n0 = hnsw._nb_point
        is_arrays = (isinstance(pairs, tuple) and len(pairs) == 2
                     and hasattr(pairs[0], "ndim"))
        npts = len(pairs[0]) if is_arrays else len(pairs)
        new_levels = hnsw.level_sampler.generate(npts)
        # Shuffle the PROCESSING order (external ids keep their identity):
        # round-mates are invisible to each other, so when ingestion order
        # correlates with geometry — cluster-sorted exports are the norm in
        # real data — a 4096-point round can swallow an entire cluster and
        # leave it with no intra-cluster links (measured on the clustered
        # bench family at 200k: recall@10 plateaued at 0.65 even at ef=512;
        # shuffled rounds restore normal graphs). The reference's racing
        # rayon build promises no insertion order either
        # (src/hnsw.rs:1222-1223). Deterministic seed -> reproducible builds.
        if npts > 1:
            p = np.random.default_rng(0xB10C ^ npts ^ n0).permutation(npts)
            pairs = ((pairs[0][p], np.asarray(pairs[1])[p]) if is_arrays
                     else [pairs[j] for j in p])
        if is_arrays:
            X, oids = pairs
            if npts:
                hnsw._set_dim(X.shape[1])
            hnsw._ensure_cap(n0 + npts)
            # bulk row copies — the per-tuple loop costs ~30-60 s at 1M on the
            # single host core; these five vectorized statements replace it
            hnsw._data[n0:n0 + npts] = X
            hnsw._origin[n0:n0 + npts] = oids
            hnsw._level[n0:n0 + npts] = new_levels
            for lvl in np.unique(new_levels):
                m = new_levels == lvl
                base = hnsw._layer_npoints[lvl]
                hnsw._rank_in_layer[n0:n0 + npts][m] = base + np.arange(m.sum())
                hnsw._layer_npoints[lvl] = base + int(m.sum())
        else:
            if pairs:
                hnsw._set_dim(len(pairs[0][0]))
            hnsw._ensure_cap(n0 + npts)
            for k, ((v, oid), lvl) in enumerate(zip(pairs, new_levels)):
                i = n0 + k
                hnsw._data[i] = np.asarray(v, dtype=hnsw.dtype)
                hnsw._origin[i] = oid
                hnsw._level[i] = lvl
                hnsw._rank_in_layer[i] = hnsw._layer_npoints[lvl]
                hnsw._layer_npoints[lvl] += 1
        self.n0 = n0
        self.n_total = n0 + npts
        self.L = L if L is not None else (
            max(max(hnsw._layers.keys(), default=0), int(new_levels.max(initial=0)),
                int(hnsw._level[:n0].max(initial=0))) + 1)
        self.widths = widths if widths is not None else tuple(
            max(hnsw._layer_width(l),
                hnsw._layers[l].width if l in hnsw._layers else 0)
            for l in range(self.L))
        self.cap1 = cap1 if cap1 is not None else ((self.n_total + 7) // 8) * 8 + 1
        self.counts = np.array([int((hnsw._level[:n0] == l).sum())
                                for l in range(self.L)], np.int64)
        self.entry = hnsw._entry
        self.entry_level = int(hnsw._level[self.entry]) if self.entry >= 0 else 0
        self.cursor = n0

    def conform(self, L: int, widths: tuple, cap1: int):
        """Adopt shared static geometry — mesh builds stack several states into one
        jitted data-parallel program, which needs identical shapes across shards."""
        assert L >= self.L and cap1 >= self.cap1
        if L > self.L:
            self.counts = np.concatenate([self.counts,
                                          np.zeros(L - self.L, np.int64)])
        self.L, self.widths, self.cap1 = int(L), tuple(widths), int(cap1)

    # -- numpy device-state arrays (callers device_put / stack + shard these) --------

    def vec_np(self) -> np.ndarray:
        h = self.hnsw
        vec = np.zeros((self.cap1, h._dim), np.float32)
        vec[: self.n_total] = h._data[: self.n_total].astype(np.float32)
        return vec

    def levels_np(self) -> np.ndarray:
        lv = np.full(self.cap1, -1, np.int32)
        lv[: self.n_total] = self.hnsw._level[: self.n_total]
        return lv

    def indeg0_np(self) -> np.ndarray:
        """Layer-0 in-degree of the pre-existing graph (resume-safe seed for
        the rounds' in-degree guarantee; fresh builds start all-zero)."""
        ind = np.zeros(self.cap1, np.int32)
        t = self.hnsw._layers.get(0)
        if t is not None and self.n0:
            v = t.ids[: self.n0]
            v = v[v >= 0]
            if len(v):
                bc = np.bincount(v, minlength=self.cap1)[: self.cap1]
                ind[: len(bc)] = bc
        return ind

    def tables_np(self) -> list:
        h = self.hnsw
        out = []
        for l in range(self.L):
            ids = np.full((self.cap1, self.widths[l]), -1, np.int32)
            dd = np.full((self.cap1, self.widths[l]), np.inf, np.float32)
            t = h._layers.get(l)
            if t is not None:
                ids[: self.n0, : t.width] = t.ids[: self.n0]
                dd[: self.n0, : t.width] = t.dists[: self.n0]
            out.append((ids, dd))
        return out

    # -- round scheduling -------------------------------------------------------------

    @property
    def remaining(self) -> int:
        return self.n_total - self.cursor

    def ramp(self, B: int) -> int:
        """Cold-start ramp: a round may not exceed the number of points already in
        the graph, else early points all link to the few seeds, whose rows can only
        absorb ``width`` backlinks, stranding the rest unreachable. Geometric growth
        (8, 16, ... B) costs log2(B) extra rounds and bounds recompiles."""
        return int(min(B, _next_pow2(max(8, self.cursor))))

    def round_batch(self, Br: int):
        """Take (up to) ``Br`` points for the next round. Returns (bidx [Br] int32
        sink-padded and sorted level-descending, n_hi) and advances bookkeeping."""
        h = self.hnsw
        s = self.cursor
        e = min(s + Br, self.n_total)
        bidx = np.full(Br, self.cap1 - 1, np.int32)  # pad -> sink (level -1, inactive)
        round_levels = h._level[s:e]
        # sort the round by level descending: level>=1 points form the static B1
        # prefix that upper-layer construction operates on
        order = np.argsort(-round_levels, kind="stable")
        bidx[: e - s] = np.arange(s, e, dtype=np.int32)[order]
        n_hi = int((round_levels >= 1).sum())
        # post-round bookkeeping (the device step is deterministic given bidx)
        if e > s:
            self.counts[:] += np.bincount(round_levels, minlength=self.L)[: self.L]
            mx = int(round_levels.max(initial=-1))
            if mx > self.entry_level:  # entry promotion (reference check_entry_point)
                self.entry = int(s + int(np.argmax(round_levels == mx)))
                self.entry_level = mx
        self.cursor = e
        return bidx, n_hi

    def flush(self, tables_np):
        """Write device tables (numpy, per layer (ids, dists)) back into the Hnsw."""
        h = self.hnsw
        n_total = self.n_total
        for l in range(self.L):
            t = h._layer_table(l)
            ids = np.asarray(tables_np[l][0][:n_total])
            dd = np.asarray(tables_np[l][1][:n_total])
            if ids.shape[1] > t.width and (ids[:, t.width:] >= 0).any():
                # device rounds ran on a conformed-wider program (another
                # shard carried reserve columns) and placed links there
                t.grow_width(ids.shape[1])
            t.ids[:n_total] = ids[:, : t.width]
            t.dists[:n_total] = dd[:, : t.width]
            t.counts[:n_total] = (ids[:, : t.width] >= 0).sum(1)
        h._nb_point = n_total
        h._entry = self.entry
        h._version += 1


def device_parallel_insert(hnsw, pairs, batch_size: Optional[int] = None,
                           expand: int = 8, build_max_iters: Optional[int] = None):
    """Build/extend an index with synchronized device rounds. Mutates ``hnsw`` in
    place (host arrays are refreshed from the device tables at the end).
    ``pairs`` is either a list of ``(vector, id)`` tuples or an ``(X, ids)``
    array pair (the bulk-ingest fast path)."""
    if isinstance(pairs, tuple) and len(pairs) == 2 and hasattr(pairs[0], "ndim"):
        X, ids = pairs
        if len(X) == 0:
            return
        if hnsw._nb_point == 0:
            hnsw.insert(X[0], int(ids[0]))  # seed entry point
            X, ids = X[1:], ids[1:]
            if len(X) == 0:
                return
        pairs = (X, ids)
    elif not pairs:
        return
    elif hnsw._nb_point == 0:
        v, i = pairs[0]
        hnsw.insert(v, i)  # seed entry point
        pairs = pairs[1:]
        if not pairs:
            return
    st = HostBuildState(hnsw, pairs)
    vectors = jnp.asarray(st.vec_np())
    sqnorms = (vectors * vectors).sum(-1)
    levels_j = jnp.asarray(st.levels_np())
    tables = tuple((jnp.asarray(i), jnp.asarray(d)) for i, d in st.tables_np())
    B = int(batch_size) if batch_size else int(min(4096, max(64, st.remaining)))
    if hnsw.extend_candidates:
        # the widen pass gathers neighbors-of-candidates: a [B*(2M)^2, d] f32
        # einsum operand. At B=16384/M=24/d=128 that is 19.3 GB — over v5e
        # HBM (measured abort). Cap the round size so the operand stays ~<6 GB.
        d_ = hnsw._dim or 1
        cap = max(256, int(6e9 / ((2 * hnsw.max_nb_connection) ** 2 * d_ * 4)))
        if B > cap:
            from ..utils.logging import init_logging
            init_logging().warning(
                "extend_candidates: capping build batch %d -> %d (widen-pass "
                "HBM bound)", B, cap)
            B = cap
    metric = hnsw.metric.name
    # bf16 traversal copy (see round_step): production-scale inner-product
    # builds only — small builds keep exact f32 (unit-test determinism), and
    # non-IP metrics have no MXU bf16 form. HNSW_BUILD_LO=0/1 overrides.
    import os as _os
    _lo_env = _os.environ.get("HNSW_BUILD_LO")
    use_lo = (metric in ("L2", "DistL2", "Dot", "DistDot", "Cosine", "DistCosine")
              and st.n_total >= 32768) if _lo_env is None else _lo_env == "1"
    vectors_lo = vectors.astype(jnp.bfloat16) if use_lo else None
    # layer-0 in-degree guarantee (RoundConfig.min_indeg): on by default;
    # HNSW_BUILD_PROTECT=0 restores the unprotected merge for A/B runs
    protect = _os.environ.get("HNSW_BUILD_PROTECT", "1") != "0"
    indeg0 = jnp.asarray(st.indeg0_np()) if protect else None
    min_indeg = int(_os.environ.get("HNSW_MIN_INDEG", 2))  # protection depth
    from ..utils.profiling import PROFILER
    PROFILER.add("build.points", st.remaining)
    while st.remaining:
        Br = st.ramp(B)
        max_obs, nonempty = st.entry_level, tuple(bool(c > 0) for c in st.counts)
        entry = st.entry
        bidx, n_hi = st.round_batch(Br)
        B1 = 0 if n_hi == 0 else int(min(Br, _next_pow2(max(8, n_hi))))
        cfg = RoundConfig(B=Br, cap1=st.cap1, num_layers=st.L, widths=st.widths,
                          efc=hnsw.ef_construction, M=hnsw.max_nb_connection,
                          metric=metric, expand=int(expand), max_obs=max_obs,
                          nonempty=nonempty,
                          keep_pruned=bool(hnsw.keep_pruned),
                          extend=bool(hnsw.extend_candidates), B1=B1,
                          max_iters=build_max_iters, min_indeg=min_indeg)
        with PROFILER.span("build.round"):
            out = _round_step(vectors, sqnorms, levels_j, tables,
                              jnp.asarray(bidx), jnp.int32(entry),
                              vectors_lo, indeg0, cfg=cfg)
            tables, indeg0 = out if protect else (out, None)
        if st.cursor % 50_000 < Br:  # reference prints every 50k (src/hnsw.rs:524-526)
            from ..utils.logging import init_logging
            init_logging().info("device insert: %d points indexed", st.cursor)
    with PROFILER.span("build.flush"):
        st.flush(tables)
    if getattr(hnsw, "_auto_repair", True):
        # Build-finalize navigability guarantee (see Hnsw.ensure_navigable):
        # on healthy graphs this is one confirming BFS; on clustered corpora it
        # is the difference between recall 0.50-at-any-ef and a working index.
        import time as _time
        _t0 = _time.time()
        with PROFILER.span("build.repair"):
            repaired = hnsw.ensure_navigable()
        hnsw._repair_stats = {"repairs": int(repaired),
                              "seconds": round(_time.time() - _t0, 2),
                              "layer0_width": int(hnsw._layers[0].width)
                              if 0 in hnsw._layers else 0,
                              # >0 means HNSW_REPAIR_BUDGET_S fired and the
                              # reachability guarantee is best-effort: this
                              # many points stayed unreached (bench/driver
                              # runs must not read that as a healthy build)
                              "incomplete": int(getattr(
                                  hnsw, "_repair_incomplete", 0))}
        if repaired:
            from ..utils.logging import init_logging
            init_logging().info("navigability repair: %d links added in %.1fs",
                                repaired, hnsw._repair_stats["seconds"])
