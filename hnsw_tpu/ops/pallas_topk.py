"""Fused brute-force k-NN scan as a Pallas TPU kernel.

The exact-search path (oracle + product feature for recall-critical serving) needs
``top-k(distances(Q, X))`` without materializing the [B, N] distance matrix in HBM
(for B=512, N=1M that is 2 GB per query batch — the naive XLA path pays two passes
over it). This kernel streams X through VMEM in tiles, computes the distance tile on
the MXU, and reduces each tile to a small per-group candidate set in-register:

  per tile of TN points:
    1. d2[B, TN] = |q|^2 - 2 q.x + |x|^2           (MXU matmul + VPU fixups)
    2. reshape to [B, G, TN/G] groups; take the two smallest per group (min + second
       min, computed with two masked min-passes) -> [B, 2G] candidate (value, index)

  cross-tile: the per-tile candidates land in an HBM buffer [tiles, B, 2G]; a final
  ``lax.top_k`` over tiles*2G candidates per query gives the answer.

With TN/G = 32, missing a true top-k member requires >= 3 of the top-k to fall into
one 32-point group of a 4096-point tile — recall is ~1.0 in practice (same
group-reduce construction as the TPU-KNN 'peak FLOP/s' design, PAPERS.md). This is
the hot op of :class:`hnsw_tpu.models.brute.BruteForceIndex`.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _tile_kernel(q_ref, xsq_ref, x_ref, outd_ref, outi_ref, *, G: int, TN: int,
                 A: int):
    i = pl.program_id(0)
    q = q_ref[:]  # [B, d]
    x = x_ref[:]  # [TN, d]
    g = jax.lax.dot_general(q, x, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [B, TN]
    d2 = xsq_ref[0] - 2.0 * g  # [1, TN] broadcast; |q|^2 added by the caller at the end
    B = d2.shape[0]
    S = TN // G  # group size
    # STRIDED groups (group g = columns {g, g+G, ...}): the [B, S, G] reshape keeps
    # the minor (lane) dimension contiguous, which Mosaic supports — a contiguous
    # [B, G, S] grouping is an unsupported lane-splitting shape cast on TPU.
    a = d2.reshape(B, S, G)
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, S, G), 1)
    # two smallest per group via min-reductions only (Mosaic has no sublane argmin:
    # recover the arg by min-reducing the iota where the value matches the min)
    m1 = jnp.min(a, axis=1)  # [B, G]
    am1 = jnp.min(jnp.where(a == m1[:, None, :], idx, S), axis=1)  # [B, G]
    masked = jnp.where(idx == am1[:, None, :], jnp.inf, a)
    m2 = jnp.min(masked, axis=1)
    am2 = jnp.min(jnp.where(masked == m2[:, None, :], idx, S), axis=1)
    am2 = jnp.minimum(am2, S - 1)  # all-inf group (padding): clamp
    # element (s, g) sits at tile column s*G + g
    col = jax.lax.broadcasted_iota(jnp.int32, (B, G), 1)
    i1 = i * TN + am1 * G + col
    i2 = i * TN + am2 * G + col

    # A consecutive tiles accumulate into ONE output block (the block stays
    # VMEM-resident across the A grid steps): the cross-tile candidate buffer —
    # which at A=1 dominates the whole scan's HBM traffic (1M x 128, B=1024:
    # [489, B, 2G] f32+i32 = 1 GB written then re-read by the final top_k,
    # 4x the bf16 corpus stream itself) — shrinks by A, and the final top_k
    # narrows from tiles*2G to (tiles/A)*2G lanes.
    if A == 1:
        outd_ref[0] = jnp.concatenate([m1, m2], axis=1)  # [B, 2G]
        outi_ref[0] = jnp.concatenate([i1, i2], axis=1)
        return

    # sliced stores (the :G / G: split sits on a 128-lane boundary) — the
    # concatenate form doubled VMEM temporaries and blew the 16 MB scoped
    # budget at B=1024 (measured 21 MB)
    @pl.when(i % A == 0)
    def _init():
        outd_ref[0, :, :G] = m1
        outd_ref[0, :, G:] = m2
        outi_ref[0, :, :G] = i1
        outi_ref[0, :, G:] = i2

    @pl.when(i % A != 0)
    def _merge():
        # running (min1, min2) per lane-group merged with this tile's pair:
        # the two smallest of {a1, a2, b1, b2} given a1<=a2, b1<=b2
        a1 = outd_ref[0, :, :G]
        a2 = outd_ref[0, :, G:]
        ia1 = outi_ref[0, :, :G]
        ia2 = outi_ref[0, :, G:]
        swap = m1 < a1
        outd_ref[0, :, :G] = jnp.where(swap, m1, a1)
        outi_ref[0, :, :G] = jnp.where(swap, i1, ia1)
        hi = jnp.where(swap, a1, m1)        # the loser of the min1 round
        lo2 = jnp.where(swap, m2, a2)       # the winner side's second
        outd_ref[0, :, G:] = jnp.minimum(hi, lo2)
        outi_ref[0, :, G:] = jnp.where(hi <= lo2,
                                       jnp.where(swap, ia1, i1),
                                       jnp.where(swap, i2, ia2))


def _tile_kernel_packed(q_ref, xsq_ref, x_ref, out_ref, *,
                        G: int, TN: int, A: int, LB: int):
    """Index-in-mantissa variant: the candidate's local row offset rides in the
    low ``LB`` bits of the f32 distance's bit pattern, so plain int32 min
    reductions carry identity for free — no argmin-recovery ``where`` chains,
    no separate index output array (the A=1 kernel's other half of the
    candidate HBM traffic). Non-negative f32s order identically under int32
    compare (qsq is added HERE, unlike the unpacked kernel, to guarantee the
    sign bit stays clear); clearing LB mantissa bits rounds each distance down
    by <= 2^-(23-LB) relative (~1.5e-5 at LB=7) — absorbed by the overfetch +
    exact-refine stage, same contract as the bf16 streaming stage."""
    i = pl.program_id(0)
    q = q_ref[:]  # [B, d]
    x = x_ref[:]  # [TN, d]
    g = jax.lax.dot_general(q, x, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [B, TN]
    # qsq computed in-kernel (one cheap [B, d] pass) rather than shipped as an
    # awkward [B, 1] block; a bf16 q only shifts each QUERY's distances by one
    # per-query constant, which cannot reorder that query's candidates
    qf = q.astype(jnp.float32)
    qsq = jnp.sum(qf * qf, axis=1, keepdims=True)  # [B, 1]
    d2 = jnp.maximum(xsq_ref[0] + qsq - 2.0 * g, 0.0)  # [B, TN] >= 0
    B = d2.shape[0]
    S = TN // G
    a = d2.reshape(B, S, G)
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    loc = jax.lax.broadcasted_iota(jnp.int32, (B, S, G), 1) + (i % A) * S
    ai = (ai & jnp.int32(~((1 << LB) - 1))) | loc
    m1 = jnp.min(ai, axis=1)  # [B, G]
    masked = jnp.where(ai == m1[:, None, :], jnp.int32(0x7FFFFFFF), ai)
    m2 = jnp.min(masked, axis=1)

    if A == 1:
        out_ref[0, :, :G] = m1
        out_ref[0, :, G:] = m2
        return

    @pl.when(i % A == 0)
    def _init():
        out_ref[0, :, :G] = m1
        out_ref[0, :, G:] = m2

    @pl.when(i % A != 0)
    def _merge():
        # two smallest of {a1, a2, m1, m2} given a1<=a2, m1<=m2 — on the packed
        # ints directly, so identity merges along with the values
        a1 = out_ref[0, :, :G]
        a2 = out_ref[0, :, G:]
        swap = m1 < a1
        out_ref[0, :, :G] = jnp.where(swap, m1, a1)
        out_ref[0, :, G:] = jnp.minimum(jnp.where(swap, a1, m1),
                                        jnp.where(swap, m2, a2))


@partial(jax.jit, static_argnames=("k", "tn", "group", "interpret", "refine",
                                   "overfetch", "acc", "packed"))
def pallas_l2_topk(q, X, xsq, k: int, tn: int = 4096, group: int = 32,
                   interpret: bool = False, refine: bool = True,
                   Xscan=None, overfetch: int = 8, acc: int = 8,
                   packed: bool = True):
    """Exact L2 top-k: returns (dists [B,k], ids [B,k]) sorted ascending.
    ``X`` must be padded to a multiple of ``tn`` rows with +inf sqnorm padding rows
    (use :func:`pad_corpus`).

    ``refine=True`` (default): overfetch the first-stage reduce and re-score the
    finalists with the DIRECT |q-x|^2 form before the final cut. The scan's
    norm-trick distances carry ~1e-7 relative f32 error, which at 1M points
    flips ranks 10<->11+ for ~0.5% of true neighbors (measured: recall 0.9947
    unrefined vs 1.0000 refined on 1M x 128). Costs ~1/3 of the scan; set
    False for the fast approximate mode when ~0.995 recall is acceptable.
    The overfetch width rounds to a multiple of 32: `lax.top_k` on this stack
    has catastrophic (B, k)-dependent performance cliffs at some odd widths
    (measured: k'=26 at B=1024 runs 1.9 s vs 49 ms at k'=32 — same input).

    ``acc``: consecutive tiles accumulated into one output block inside the
    kernel (running min1/min2 merge per lane-group, VMEM-resident). The
    cross-tile candidate buffer and the final top_k width both shrink by
    ``acc``; at 1M x 128 / B=1024 / acc=1 that buffer is ~1 GB of HBM
    round-trip — 4x the bf16 corpus stream — so this is the scan's dominant
    knob. Recall cost is negligible: a miss needs >= 3 true top-k ids
    congruent mod G inside one acc*tn-row span (P ~ C(k,3)/(n_blocks*G)^2,
    ~1e-5 per query at acc=8, 1M points, k=10).

    ``Xscan``: optional reduced-precision copy of ``X`` (same padded shape,
    e.g. bfloat16) used ONLY for the streaming matmul stage — the MXU runs
    bf16 inputs at ~8x the f32 rate and the X tile stream halves its HBM
    traffic. The refine stage still gathers finalists from the full-precision
    ``X``, so exactness is preserved as long as the first stage does not MISS
    a true neighbor; widen ``overfetch`` (first-stage keep = k + overfetch,
    rounded up to a multiple of 32) to absorb bf16 rank noise near the cut."""
    B, d = q.shape
    N = X.shape[0]
    assert N % tn == 0, "pad X to a multiple of tn"
    G = tn // group
    n_tiles = N // tn
    acc = max(1, min(acc, n_tiles))
    n_blocks = (n_tiles + acc - 1) // acc
    qf = q.astype(jnp.float32)
    Xs = X.astype(jnp.float32) if Xscan is None else Xscan
    qs = qf.astype(Xs.dtype)
    if packed:
        # index-in-mantissa kernel: ONE int32 output, ~half the VPU passes
        LB = max(1, (group * acc - 1).bit_length())
        out = pl.pallas_call(
            partial(_tile_kernel_packed, G=G, TN=tn, A=acc, LB=LB),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((B, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tn), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B, 2 * G), lambda i: (i // acc, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((n_blocks, B, 2 * G), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * N * d,
                bytes_accessed=N * d * Xs.dtype.itemsize + B * d * 4,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(qs, xsq.reshape(n_tiles, 1, tn), Xs)[0]
        cv = jnp.moveaxis(out, 0, 1).reshape(B, -1)  # [B, blocks*2G] packed
        cv = jax.lax.optimization_barrier(cv)  # see the unpacked path's note

        def decode(vals, cols):
            """packed int32 + column position -> (d2-with-qsq f32, global id)"""
            dval = jax.lax.bitcast_convert_type(
                vals & jnp.int32(~((1 << LB) - 1)), jnp.float32)
            loc = vals & jnp.int32((1 << LB) - 1)
            block = cols // (2 * G)
            lane = (cols % (2 * G)) % G
            ids = (block * acc + loc // group) * tn + (loc % group) * G + lane
            return dval, jnp.minimum(ids, N - 1)

        kk = k if not refine else min(max(32, _round_up(k + overfetch, 32)),
                                      cv.shape[1])
        neg, pos = jax.lax.top_k(-cv, kk)
        dval, ids = decode(-neg, pos)
        if not refine:
            return jnp.sqrt(jnp.maximum(dval, 0.0)), ids
        xv = X[ids].astype(jnp.float32)  # [B, kk, d] — finalists only
        diff = xv - qf[:, None, :]
        d2 = (diff * diff).sum(-1)
        d2 = jnp.where(dval >= jnp.float32(1e37), jnp.inf, d2)  # padding rows
        neg2, pos2 = jax.lax.top_k(-d2, k)
        out_ids = jnp.take_along_axis(ids, pos2, axis=1)
        return jnp.sqrt(jnp.maximum(-neg2, 0.0)), out_ids
    outd, outi = pl.pallas_call(
        partial(_tile_kernel, G=G, TN=tn, A=acc),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            # xsq ships as [tiles, 1, tn]: a flat (tn,) block at tn<1024 trips
            # an XLA-vs-Mosaic 1-D tiling mismatch, and a [tiles, tn] block of
            # (1, tn) violates the last-two-dims-(8,128)-divisible rule; the
            # extra unit dim makes the trailing block dims (1, tn) legal.
            pl.BlockSpec((1, 1, tn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, 2 * G), lambda i: (i // acc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * G), lambda i: (i // acc, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, B, 2 * G), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, B, 2 * G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * d,
            bytes_accessed=N * d * Xs.dtype.itemsize + B * d * 4,
            transcendentals=0),
        # the accumulating kernel's read-modify-write of the output block plus
        # the [B, S, G] reduce chain exceeds the compiler's DEFAULT 16 MB
        # scoped-vmem cap at B=1024/tn=2048 (measured 17-21 MB); v5e physically
        # carries far more VMEM, so raise the cap rather than shrink the tile
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,  # CPU tests run the kernel interpreted
    )(qs, xsq.reshape(n_tiles, 1, tn), Xs)
    cd = jnp.moveaxis(outd, 0, 1).reshape(B, -1)  # [B, tiles*2G]
    ci = jnp.moveaxis(outi, 0, 1).reshape(B, -1)
    # The barrier forces the [tiles,B,2G] -> [B,tiles*2G] transpose to
    # MATERIALIZE before the top_k. Without it XLA fuses the transpose into the
    # sort's operand reads and the final reduce degrades catastrophically
    # (measured on v5e at 1M x 128, B=512: 1.3 s vs 21 ms for the whole scan —
    # a 60x cliff on the identical computation).
    cd, ci = jax.lax.optimization_barrier((cd, ci))
    qsq = (qf * qf).sum(-1, keepdims=True)
    if not refine:
        neg, pos = jax.lax.top_k(-cd, k)
        ids = jnp.take_along_axis(ci, pos, axis=1)
        return jnp.sqrt(jnp.maximum(-neg + qsq, 0.0)), ids
    kk = min(max(32, _round_up(k + overfetch, 32)), cd.shape[1])
    neg, pos = jax.lax.top_k(-cd, kk)
    ids = jnp.take_along_axis(ci, pos, axis=1)
    xv = X[ids].astype(jnp.float32)  # [B, kk, d] — finalists only
    diff = xv - qf[:, None, :]
    d2 = (diff * diff).sum(-1)
    # padding rows are zero vectors with a faked 3e38 sqnorm: their direct-form
    # distance would look small, so re-mask them by their first-stage score
    d2 = jnp.where(-neg >= jnp.float32(1e37), jnp.inf, d2)
    neg2, pos2 = jax.lax.top_k(-d2, k)
    out_ids = jnp.take_along_axis(ids, pos2, axis=1)
    return jnp.sqrt(jnp.maximum(-neg2, 0.0)), out_ids


def pad_corpus(X: np.ndarray, tn: int = 4096, shuffle: bool | None = None,
               seed: int = 0x5EED):
    """Pad X to a multiple of ``tn`` rows; padding rows get huge coordinates so their
    sqnorm dominates and they never enter the top-k. Returns (Xp, xsq, perm)
    where ``perm`` maps kernel row -> original row (identity when not shuffled).

    ``shuffle`` (default: on for corpora above one tile) stores the corpus in a
    fixed random row order. The accumulating kernel keeps only the 2 smallest
    distances per (block, lane) cell, and cells group rows that are congruent
    mod G within a block — so a corpus whose ids CORRELATE with geometry
    (e.g. cluster-ordered ingestion: the bench's clustered family, or any
    sorted real-world export) piles near-duplicates into shared cells and
    loses true neighbors (measured: fp64 recall 0.9939 on the clustered gate
    vs 0.9999 on iid gaussians at 200k x 128). A one-time random permutation
    restores the iid collision analysis (~1e-4/query) for ANY id order."""
    N, d = X.shape
    Np = _round_up(max(N, tn), tn)
    if shuffle is None:
        shuffle = N > tn
    Xp = np.zeros((Np, d), np.float32)
    if shuffle:
        perm = np.random.default_rng(seed).permutation(N)
        np.take(X, perm, axis=0, out=Xp[:N])
    else:
        perm = np.arange(N)
        Xp[:N] = X
    # chunked fp64 accumulation: a full X.astype(f64) is GBs of fresh pages at
    # 1M x 128 (pathologically slow on this microVM — see CLAUDE.md)
    xsq = np.empty(Np, np.float32)
    for s in range(0, N, 65536):
        c = Xp[s:min(s + 65536, N)].astype(np.float64)
        xsq[s:min(s + 65536, N)] = (c * c).sum(-1).astype(np.float32)
    xsq[N:] = np.float32(3.0e38)
    return Xp, xsq, perm


def pallas_l2_topk_stream(queries: np.ndarray, X, xsq, k: int, *, tn: int,
                          group: int, Xscan=None, overfetch: int = 8,
                          acc: int = 8, batch: int = 2048, query_dtype=None,
                          packed: bool = True, interpret: bool = False):
    """Pipelined exact-scan serving over a host query stream.

    Same host-side harness as ``device_search_stream``: ``jnp.asarray`` is a
    SYNCHRONOUS host->device transfer on this stack, so a daemon thread stages
    the next uploads while the main thread dispatches kernels and fetches
    results — upload overlaps compute instead of serializing with it. Serving
    throughput is whichever of {kernel rate, host link rate} binds.

    ``query_dtype="f16"`` uploads queries as float16 (halves link bytes; the
    refine stage re-scores finalists from the f16-rounded query in f32, a
    ~0.05% perturbation that recall scoring sees honestly).

    Returns (dists [nq, k] f32, ids [nq, k] int64 — local row indices).
    """
    q = np.asarray(queries, np.float32)
    if q.ndim == 1:
        q = q[None, :]
    if query_dtype in ("f16", "float16", np.float16):
        q = q.astype(np.float16)
    elif query_dtype not in (None, "f32", "float32", np.float32):
        raise ValueError(f"unsupported query_dtype {query_dtype!r}")
    nq = q.shape[0]
    out_d = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int64)
    work = [(s, min(s + batch, nq)) for s in range(0, nq, batch)]

    from .stream import pipelined_stream

    def _upload(w):
        ws, we = w
        qb = q[ws:we]
        if we - ws < batch:  # pad the tail to the compiled batch shape
            qb = np.concatenate([qb, np.repeat(qb[-1:], batch - (we - ws), 0)])
        return jnp.asarray(qb)

    def _dispatch(w, dev):
        return pallas_l2_topk(dev, X, xsq, k, tn=tn, group=group, Xscan=Xscan,
                              overfetch=overfetch, acc=acc, packed=packed,
                              interpret=interpret)

    def _fetch(w, out):
        ws, we = w
        dd, ii = out
        out_d[ws:we] = np.array(dd)[: we - ws]
        out_i[ws:we] = np.array(ii)[: we - ws]

    pipelined_stream(work, _upload, _dispatch, _fetch)
    return out_d, out_i


def pick_tn(d: int) -> int:
    """Corpus tile rows for a given dimension. The kernel's scoped VMEM scales
    with tn*d (the X tile) plus O(B*tn) score temps: tn=2048 fits comfortably at
    d=128 (~14 MB of the 16 MB budget) but OOMs at d=784 (measured 20.5 MB);
    halve the tile as d grows. (The axon remote compiler also dislikes very
    large grids, so don't go below 512 rows without need.)

    Callers must keep ``group = tn // 128`` so the per-group lane dimension
    G = tn/group stays 128 — other G values are an unsupported Mosaic shape
    cast (measured at G=32)."""
    if d <= 256:
        return 2048
    if d <= 512:
        return 1024
    return 512
