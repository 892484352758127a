"""Fused codec-score kernel for the beam loop.

The beam iteration's score block — dequantize the gathered int8 neighborhood
blocks, inner-product against the query, add the norm terms — is ~4.7 ms/iter
at B=4096, K=192, d=128 when expressed as XLA ops (the int8->f32 convert, the
broadcast multiply and the reduction each stream a [B,K,d]-shaped intermediate
through HBM: ~800 MB of traffic per iteration). This kernel runs the whole
chain VMEM-resident per query tile: one pass over the 100 MB of gathered int8
bytes, everything else stays on-chip.

The HBM gather of the blocks themselves stays in XLA (measured ~70 GB/s,
1.4 ms/iter — the gather unit is already good at 6 KB rows); the kernel
consumes its output. Distance forms mirror ``beam_search.scores_codec``
(L2 via the norm trick, Dot/Cosine as 1 - ip), reference semantics
``src/hnsw.rs:922-1064``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale_ref, q_ref, blk_ref, csq_ref, qsn_ref, out_ref, *, K: int,
            d: int, form: str, QT: int):
    # qsn_ref carries a per-form query norm quantity: the SQUARED norm |q|^2 for
    # "l2", the plain L2 norm |q| for "cosine"; unused for "dot".
    blk = blk_ref[:].reshape(QT, K, d).astype(jnp.float32)  # int8 -> f32 in VMEM
    qv = q_ref[:]  # [QT, d] f32
    ip = (blk * qv[:, None, :]).sum(-1) * scale_ref[0, 0]  # [QT, K]
    if form == "l2":
        out_ref[:] = jnp.sqrt(jnp.maximum(qsn_ref[:] - 2.0 * ip + csq_ref[:], 0.0))
    elif form == "dot":
        out_ref[:] = 1.0 - ip
    else:  # cosine over pre-normalized blocks: only the query norm remains
        out_ref[:] = 1.0 - ip / jnp.maximum(qsn_ref[:], 1e-20)


@partial(jax.jit, static_argnames=("form", "qt", "interpret"))
def pallas_codec_scores(q, blk, csq, qsq_or_norm, scale, form: str = "l2",
                        qt: int = 16, interpret: bool = False):
    """Scores [B, K] from gathered codec rows.

    Args:
      q: [B, d] f32 queries.
      blk: [B, K*d] int8 — gathered neighborhood blocks, flattened.
      csq: [B, K] f32 — quantized-row squared norms (L2) or zeros.
      qsq_or_norm: [B, 1] f32 — form-dependent: pass the SQUARED query norm
        |q|^2 for form="l2", the plain L2 norm |q| for form="cosine" (the
        codec's cosine blocks are pre-normalized, so only |q| remains in the
        denominator); ignored for form="dot". Passing the wrong quantity
        silently corrupts distances — see ``scores_codec`` for the canonical
        caller.
      scale: [] f32 dequantization multiplier.
      form: "l2" | "dot" | "cosine".
      qt: queries per grid step (grid = B // qt; keep modest — the axon remote
        Mosaic compiler dislikes very large grids).
    """
    B, d = q.shape
    K = csq.shape[1]
    assert B % qt == 0, (B, qt)
    return pl.pallas_call(
        partial(_kernel, K=K, d=d, form=form, QT=qt),
        grid=(B // qt,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, K * d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=2 * B * K * d,
                                      bytes_accessed=B * K * d + B * K * 4,
                                      transcendentals=0),
        interpret=interpret,
    )(scale.reshape(1, 1), q.astype(jnp.float32), blk, csq, qsq_or_norm)


# NOTE (measured, v5e): folding the revisit-suppression masks into this kernel
# (beam/history membership + intra-step dup via [QT,K,K] broadcast-compares in
# Mosaic) ran 3x SLOWER than leaving them to XLA (17.4 vs 5.5 ms/iter at
# B=4096, identical beam ids) — Mosaic lowers the non-128-aligned K=192
# broadcast reductions poorly. The masks stay in beam_search.beam_search_layer.


def _fused_kernel(src_ref, scale_ref, q_ref, qsn_ref, blocks_ref, out_ref,
                  scratch, sems, *, E: int, M0: int, d: int, QT: int,
                  form: str, SLOTS: int = 2):
    """See _fused_kernel_ids for the ids-emitting variant."""
    """Gather + dequant + dot + norms in ONE kernel: the expanded nodes' int8
    neighborhood blocks are DMA'd straight from the HBM codec table into a
    multi-buffered VMEM scratch (indices arrive via scalar prefetch), so the
    blocks cross HBM once per iteration. The XLA-gather form writes the
    [B, E, M0*d] gather result to HBM and re-reads it in the score kernel —
    3x the traffic (measured on v5e, 1M codec, B=8192 E=4: 21 ms fused vs
    40 ms gather+kernel, bit-identical output). ``csq`` is recomputed from the
    dequantized block in VMEM, eliminating the blocks_sq gather entirely.

    ``SLOTS`` is the prefetch depth: grid step i consumes scratch slot
    i % SLOTS and issues step i+SLOTS-1's row DMAs — the per-row HBM access
    latency (not bandwidth: ~6 KB rows at random addresses) is what bounds
    this kernel on large codec tables, so keeping SLOTS*QT*E row copies in
    flight hides more of it than classic double buffering. A slot's next
    overwrite is issued one full step after its compute consumed it, same
    write-after-read spacing as the SLOTS=2 scheme."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    RE = QT * E

    def issue(step, slot):
        base = step * RE
        for j in range(RE):
            idx = src_ref[base + j]
            pltpu.make_async_copy(blocks_ref.at[idx], scratch.at[slot, j],
                                  sems.at[slot, j]).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)
        for s in range(1, SLOTS - 1):  # static unroll of the pipeline fill
            @pl.when(s < n)
            def _(s=s):
                issue(s, s)

    @pl.when(i + SLOTS - 1 < n)
    def _():
        issue(i + SLOTS - 1, (i + SLOTS - 1) % SLOTS)

    slot = i % SLOTS
    for j in range(RE):
        idx = src_ref[i * RE + j]
        pltpu.make_async_copy(blocks_ref.at[idx], scratch.at[slot, j],
                              sems.at[slot, j]).wait()
    blk = scratch[slot].reshape(QT, E, M0, d).astype(jnp.float32)
    qv = q_ref[:]  # [QT, d] f32
    sc = scale_ref[0, 0]
    ip = (blk * qv[:, None, None, :]).sum(-1).reshape(QT, E * M0) * sc
    if form == "l2":
        csq = (blk * blk).sum(-1).reshape(QT, E * M0) * (sc * sc)
        out_ref[:] = jnp.sqrt(jnp.maximum(qsn_ref[:] - 2.0 * ip + csq, 0.0))
    elif form == "dot":
        out_ref[:] = 1.0 - ip
    else:  # cosine over pre-normalized blocks: only the query norm remains
        out_ref[:] = 1.0 - ip / jnp.maximum(qsn_ref[:], 1e-20)


def _fused_kernel_ids(src_ref, scale_ref, q_ref, qsn_ref, blocks_ref,
                      out_ref, oid_ref, scratch, sems, *, E: int, M0: int,
                      RID: int, d: int, QT: int, form: str, SLOTS: int = 2):
    """_fused_kernel over id-carrying blocks: each DMA'd [M0+RID, d] block row
    holds the node's quantized neighbor vectors (rows [0:M0]) plus its layer-
    table ids, int32-bitcast to bytes (rows [M0:], see ``BeamCodec.id_rows``).
    The ids are emitted as a raw-byte second output. This removes the beam
    loop's separate XLA gather of [B, E] table rows — measured 5.1 ms/iter at
    B=16384 E=4 M0=56 on 1M (2.9 GB/s: 224-byte random rows are pure access
    latency, the largest single component of the iteration) — for +RID/M0
    bytes on DMAs already in flight (same DMA count, no extra issue cost).
    The caller bitcasts the bytes back to int32 in XLA (contiguous, cheap)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    RE = QT * E

    def issue(step, slot):
        base = step * RE
        for j in range(RE):
            idx = src_ref[base + j]
            pltpu.make_async_copy(blocks_ref.at[idx], scratch.at[slot, j],
                                  sems.at[slot, j]).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)
        for s in range(1, SLOTS - 1):  # static unroll of the pipeline fill
            @pl.when(s < n)
            def _(s=s):
                issue(s, s)

    @pl.when(i + SLOTS - 1 < n)
    def _():
        issue(i + SLOTS - 1, (i + SLOTS - 1) % SLOTS)

    slot = i % SLOTS
    for j in range(RE):
        idx = src_ref[i * RE + j]
        pltpu.make_async_copy(blocks_ref.at[idx], scratch.at[slot, j],
                              sems.at[slot, j]).wait()
    raw = scratch[slot]  # [RE, M0+RID, d] i8
    oid_ref[:] = raw[:, M0:, :].reshape(QT, E * RID * d)
    blk = raw[:, :M0, :].reshape(QT, E, M0, d).astype(jnp.float32)
    qv = q_ref[:]  # [QT, d] f32
    sc = scale_ref[0, 0]
    ip = (blk * qv[:, None, None, :]).sum(-1).reshape(QT, E * M0) * sc
    if form == "l2":
        csq = (blk * blk).sum(-1).reshape(QT, E * M0) * (sc * sc)
        out_ref[:] = jnp.sqrt(jnp.maximum(qsn_ref[:] - 2.0 * ip + csq, 0.0))
    elif form == "dot":
        out_ref[:] = 1.0 - ip
    else:  # cosine over pre-normalized blocks: only the query norm remains
        out_ref[:] = 1.0 - ip / jnp.maximum(qsn_ref[:], 1e-20)


@partial(jax.jit, static_argnames=("E", "M0", "form", "qt", "slots",
                                   "interpret"))
def pallas_fused_codec_scores_ids(src, q, qsn, scale, blocks3, E: int,
                                  M0: int, form: str = "l2", qt: int = 8,
                                  slots: int = 2, interpret: bool = False):
    """Fused gather+score that ALSO returns the expanded nodes' neighbor ids.

    Args (vs pallas_fused_codec_scores):
      blocks3: [cap1, M0 + id_rows, d] int8 — id-carrying codec table
        (``BeamCodec`` built with ``id_rows`` > 0).
      M0: vector rows per block (static; blocks3.shape[1] - M0 = id rows).

    Returns (scores [B, E*M0] f32, nbr [B, E*M0] int32) — the int32 decode and
    the id-capacity -> M0 segment slice happen caller-side in XLA (contiguous,
    cheap).
    """
    B = q.shape[0]
    M0T, d = blocks3.shape[1], blocks3.shape[2]
    RID = M0T - M0
    assert RID > 0 and RID * d >= 4 * M0, (M0T, M0, d)
    RE = qt * E
    slots = max(2, min(int(slots), max(2, B // qt)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // qt,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, d), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((qt, E * M0), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, E * RID * d), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((slots, RE, M0T, d), jnp.int8),
            pltpu.SemaphoreType.DMA((slots, RE)),
        ],
    )
    sc, raw = pl.pallas_call(
        partial(_fused_kernel_ids, E=E, M0=M0, RID=RID, d=d, QT=qt, form=form,
                SLOTS=slots),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, E * M0), jnp.float32),
                   jax.ShapeDtypeStruct((B, E * RID * d), jnp.int8)),
        interpret=interpret,
    )(src.reshape(-1), scale.reshape(1, 1), q.astype(jnp.float32), qsn,
      blocks3)
    # decode: [B, E*RID*d] i8 -> [B, E, RID*d/4, 4] -> i32 -> [:, :, :M0]
    idcap = RID * d // 4
    nbr = jax.lax.bitcast_convert_type(
        raw.reshape(B, E, idcap, 4), jnp.int32)
    return sc, nbr[:, :, :M0].reshape(B, E * M0)


@partial(jax.jit, static_argnames=("E", "form", "qt", "slots", "interpret"))
def pallas_fused_codec_scores(src, q, qsn, scale, blocks3, E: int,
                              form: str = "l2", qt: int = 8, slots: int = 2,
                              interpret: bool = False):
    """Scores [B, E*M0] straight from (expanded-node ids, HBM codec table).

    Args:
      src: [B, E] int32 — expanded node ids (clipped to valid rows).
      q: [B, d] f32 queries.
      qsn: [B, 1] f32 — |q|^2 for "l2", |q| for "cosine" (see
        pallas_codec_scores); ignored for "dot".
      scale: [] f32 dequantization multiplier.
      blocks3: [cap1, M0, d] int8 — the codec table, UNgathered (stays in HBM).
      E: expanded nodes per query (static).
      qt: queries per grid step (qt*E row DMAs issued together).
      slots: VMEM scratch buffers / prefetch depth (2 = double buffering).
    """
    B = q.shape[0]
    M0, d = blocks3.shape[1], blocks3.shape[2]
    RE = qt * E
    slots = max(2, min(int(slots), max(2, B // qt)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // qt,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, d), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((qt, E * M0), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, RE, M0, d), jnp.int8),
            pltpu.SemaphoreType.DMA((slots, RE)),
        ],
    )
    return pl.pallas_call(
        partial(_fused_kernel, E=E, M0=M0, d=d, QT=qt, form=form, SLOTS=slots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, E * M0), jnp.float32),
        interpret=interpret,
    )(src.reshape(-1), scale.reshape(1, 1), q.astype(jnp.float32), qsn, blocks3)
