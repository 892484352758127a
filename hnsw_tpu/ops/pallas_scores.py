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
