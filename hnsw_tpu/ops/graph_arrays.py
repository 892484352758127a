"""Device-resident dense graph representation.

The reference keeps the graph as ``Arc<Point>`` objects with per-point locked neighbor
lists (``src/hnsw.rs:162-259``, ``:394-622``). On TPU the graph is a handful of flat
HBM arrays (static shapes, jit-friendly):

  * ``vectors    : f32[cap1, dim]``   — row ``cap1-1`` is a reserved sink/padding row
  * ``sqnorms    : f32[cap1]``        — cached squared norms (L2 matmul trick)
  * ``levels     : i32[cap1]``        — insertion level per point (-1 = unallocated)
  * ``layer_ids  : tuple of i32[cap1, width_l]`` — per-layer neighbor ids, -1 padded
  * ``layer_dists: tuple of f32[cap1, width_l]`` — cached link distances (needed by
    construction and persistence, mirroring reference ``dist_to_ref``,
    ``src/hnsw.rs:269-271``); not needed by the search path
  * ``entry      : i32[]`` scalar     — entry point index

``width_0 = 2*M``, ``width_l = M`` (reference ``src/hnsw.rs:1177-1182``). Any point may
carry links at any layer (reference's projection links and ``l_n`` backlinks), hence
full-height tables per layer; upper layers are allocated only up to the highest level
observed.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, donate_argnums=0)
def _blocks_update(blocks, rows, start):
    return jax.lax.dynamic_update_slice(blocks, rows, (start, 0, 0))


def _gather_blocks(vq, safe, idbytes=None):
    """blocks[g] = vq[safe[g]] as [cap1, M0(+id_rows), d], built in ~512MB
    chunks with donated in-place writes — the one-shot gather needs 2x the
    final array transiently (12GB at 1M x 48 x 128 int8), which blows v5e HBM.
    The blocks stay 3-D: the fused gather+score kernel addresses whole rows
    from HBM, and reshaping a captured 6GB table inside a jitted program costs
    a full second copy (measured: compile-time OOM at 17.9G/15.75G).

    ``idbytes`` ([cap1, id_rows, d], same dtype) appends per-node id rows —
    see ``BeamCodec.id_rows``."""
    cap1, M0 = safe.shape
    d = vq.shape[1]
    r_id = 0 if idbytes is None else idbytes.shape[1]
    itemsize = jnp.dtype(vq.dtype).itemsize
    chunk = max(1024, (1 << 29) // max(1, (M0 + r_id) * d * itemsize))
    if cap1 <= 2 * chunk and idbytes is None:
        return vq[safe]
    blocks = jnp.zeros((cap1, M0 + r_id, d), vq.dtype)
    s = 0
    while s < cap1:
        e = min(s + chunk, cap1)
        if e - s < chunk:  # keep one jit signature: final chunk re-spans backward
            s = cap1 - chunk
            e = cap1
        rows = vq[safe[s:e]]
        if idbytes is not None:
            rows = jnp.concatenate([rows, idbytes[s:e]], axis=1)
        blocks = _blocks_update(blocks, rows, jnp.int32(s))
        s = e
    return blocks


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BeamCodec:
    """Neighborhood-blocked quantized traversal store for the beam layer.

    The beam search's dominant cost is the HBM gather of candidate vectors:
    ``[B, E*M0]`` scattered rows of ~512 bytes each (measured ~60-70 GB/s effective
    on v5e — byte-bound). This codec re-lays the data out so one gather row fetches
    one expanded node's ENTIRE layer-0 neighborhood, quantized:

      * ``blocks[g]``    = the int8/bf16 vectors of node g's layer-0 neighbours,
                           contiguous ``[M0*d]`` — ids stay in the layer table
      * ``blocks_sq[g]`` = f32 squared norms of those dequantized rows (L2 needs them)

    Per iteration the gather shrinks from ``B*E*M0`` rows of ``4d`` bytes to ``B*E``
    rows of ``M0*d`` (int8) bytes — 16x fewer bytes at d=128. Traversal distances
    become approximate (int8 ~ 2.4 valid decimal digits); callers re-score the final
    beam against the exact f32 vectors (``exact_rerank``), so returned neighbours and
    distances match the exact engine up to beam membership.

    Supported metrics: the inner-product family (L2 / Dot / Cosine). Cosine blocks
    store L2-normalized rows so the Dot form applies.
    """

    # blocks: [cap1, M0 + id_rows, d] int8 (or [cap1, M0, d] bfloat16 with
    # scale == 1). Rows [0:M0] are the quantized neighbor vectors; when
    # ``id_rows`` > 0 the trailing rows carry the node's layer-table ids,
    # int32-bitcast to bytes (-1 padded). The fused score kernel DMAs the
    # whole [M0+id_rows, d] block per expanded node and emits the neighbor
    # ids as a second output — replacing the beam loop's separate XLA gather
    # of [B, E] table rows, which measured 5.1 ms/iter at B=16384 E=4 on 1M
    # (224-byte random rows through the gather unit are pure access latency,
    # the largest single component of the iteration) with +id_rows/M0 bytes
    # on DMAs already in flight. id rows are padded to keep the total a
    # multiple of 8 (Mosaic sublane tiling for sliced dim 1 — the round-3
    # 52-wide crash class).
    blocks: jax.Array
    blocks_sq: jax.Array  # [cap1, M0] f32
    scale: jax.Array  # [] f32 dequantization multiplier
    M0: int = 0
    dim: int = 0
    metric_name: str = "L2"
    id_rows: int = 0

    def tree_flatten(self):
        return (self.blocks, self.blocks_sq, self.scale), (
            self.M0, self.dim, self.metric_name, self.id_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    SUPPORTED = ("L2", "DistL2", "Dot", "DistDot", "Cosine", "DistCosine")

    @classmethod
    def build(cls, g: "GraphArrays", kind: str = "i8", layer: int = 0,
              width: Optional[int] = None) -> "BeamCodec":
        """Device-side construction from a graph snapshot (one big gather).

        ``width`` caps the stored neighborhood to the first ``width`` table entries
        (per-row neighbor lists are kept distance-sorted by construction, so this
        keeps the nearest links). Traversal then expands ``width`` neighbors per
        node instead of the full 2*M — fewer gather bytes and a smaller merge
        frontier, at a small recall-per-ef cost. Callers must beam-search over the
        identically sliced layer table (``search_program`` does)."""
        if g.metric_name not in cls.SUPPORTED:
            raise ValueError(f"codec unsupported for metric {g.metric_name}")
        from ..utils.profiling import PROFILER
        with PROFILER.span("codec.build"):
            return cls._build(g, kind, layer, width)

    @classmethod
    def _build(cls, g: "GraphArrays", kind: str, layer: int,
               width: Optional[int]) -> "BeamCodec":
        tbl = g.layer_ids[layer]
        if width is not None and width < tbl.shape[1]:
            # round the cap up to 8 with REAL table columns so the codec's
            # columns always stay a prefix of the layer table (search_program
            # traverses tbl[:, :M0] — mixing real neighbor ids with padded
            # codec blocks would mis-score them)
            tbl = tbl[:, :min(_round_up(width, 8), tbl.shape[1])]
        # Mosaic alignment: the fused gather+score kernel DMAs whole [M0, d]
        # rows from the HBM blocks table and requires dim 1 to be 8-aligned
        # (sublane tiling). Navigability repair grows layer-0 tables to
        # arbitrary widths, so pad the codec neighborhood with -1 columns up
        # to the next multiple of 8 — search_program pads its traversal table
        # slice to match, and the -1 ids mask the padded scores to INF.
        M0a = _round_up(tbl.shape[1], 8)
        if M0a != tbl.shape[1]:
            tbl = jnp.pad(tbl, ((0, 0), (0, M0a - tbl.shape[1])),
                          constant_values=-1)
        cap1, M0 = tbl.shape
        d = g.vectors.shape[1]
        v = g.vectors.astype(jnp.float32)
        if g.metric_name in ("Cosine", "DistCosine"):
            nrm = jnp.sqrt(jnp.maximum((v * v).sum(-1, keepdims=True), 1e-20))
            v = v / nrm
        safe = jnp.clip(tbl, 0, cap1 - 1)
        # per-vector squared norms of the QUANTIZED values, gathered into [cap1, M0]
        # (never materialize the [cap1, M0, d] f32 dequantization — 24 GB at 1M)
        if kind == "bf16":
            vq = v.astype(jnp.bfloat16)
            scale = jnp.float32(1.0)
            vf = vq.astype(jnp.float32)
            qsq = (vf * vf).sum(-1)
        else:
            amax = jnp.maximum(jnp.abs(v).max(), 1e-12)
            qscale = 127.0 / amax
            vq = jnp.clip(jnp.round(v * qscale), -127, 127).astype(jnp.int8)
            scale = (amax / 127.0).astype(jnp.float32)
            qi = vq.astype(jnp.int32)
            qsq = (qi * qi).sum(-1).astype(jnp.float32) * (scale * scale)
        # id rows (int8 kind, lane-aligned d only — the fused kernel's domain):
        # the node's M0 table ids, int32-bitcast to bytes and padded up to
        # whole [r_id, d] rows with -1, keeping M0 + r_id a multiple of 8
        idbytes = None
        r_id = 0
        if kind != "bf16" and d % 128 == 0:
            r_id = _round_up(M0 + max(1, -(-(M0 * 4) // d)), 8) - M0
            idcap = r_id * d // 4  # int32 ids that fit the padded rows
            idp = jnp.pad(tbl, ((0, 0), (0, idcap - M0)), constant_values=-1)
            idbytes = jax.lax.bitcast_convert_type(idp, jnp.int8).reshape(
                cap1, r_id, d)
        blocks = _gather_blocks(vq, safe, idbytes)
        blocks_sq = qsq[safe]
        return cls(blocks=blocks, blocks_sq=blocks_sq, scale=scale,
                   M0=M0, dim=d, metric_name=g.metric_name, id_rows=r_id)

    @property
    def nbytes(self) -> int:
        return (self.blocks.size * jnp.dtype(self.blocks.dtype).itemsize
                + self.blocks_sq.size * 4)


# Pivot-start threshold: below this the graph is small enough that the greedy
# upper-layer descent is already ~free (and tests compare against the serial
# oracle's descent); above it, the MXU scan strictly improves the entry point.
PIVOT_MIN_POINTS = 32_768

# Metrics whose pivot scan has an MXU matmul form (scores_matmul).
_PIVOT_METRICS = ("L2", "DistL2", "Dot", "DistDot", "Cosine", "DistCosine")


def compute_pivots(hnsw, layer0_ids, n: int):
    """The entry-pivot set a search snapshot of ``hnsw`` will use, or None.

    IVF-style widened pivot set: the hierarchy's level>=1 points plus a
    component-aware corpus fill (ops/components.select_pivots). The beam only
    runs on layer 0, so ANY point can serve as an entry pivot; more pivots =
    closer starts = fewer beam iterations, for one (cheap, MXU-resident) extra
    matmul. Auto policy: ~n/64 pivots capped at 16k (measured at 1M: +0.0013
    recall over the bare 1752-point hierarchy for ~0.3 ms of matmul per
    8k-query batch). Shared with ``Hnsw.ensure_navigable`` so the build-time
    reachability guarantee covers exactly the seeds search starts from.
    """
    pivot_count = getattr(hnsw, "_pivot_count", None)
    has_matmul = (hnsw.metric.name in _PIVOT_METRICS
                  or hnsw.metric.jnp_matmul_scores is not None)  # UserMetric
    if pivot_count == 0 or n < PIVOT_MIN_POINTS or not has_matmul:
        return None
    from .components import select_pivots
    base = np.flatnonzero(hnsw._level[:n] >= 1)
    need = (min(16_384, max(len(base), n // 64)) if pivot_count is None
            else int(pivot_count))
    pv = select_pivots(hnsw._level, layer0_ids, n, need)
    return pv if len(pv) >= 8 else None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GraphArrays:
    """Immutable device snapshot of an index (search path). Registered as a pytree so
    it can be passed straight into jitted programs."""

    vectors: jax.Array  # [cap1, dim] f32
    sqnorms: jax.Array  # [cap1]
    levels: jax.Array  # [cap1] i32
    layer_ids: tuple  # tuple of [cap1, width_l] i32
    layer_dists: tuple  # tuple of [cap1, width_l] f32 (may be empty tuple for search-only)
    entry: jax.Array  # [] i32
    # pivot_ids: indices of all level>=1 points — the upper HNSW hierarchy as a
    # flat array. The search path brute-force scores the query against ALL of
    # them on the MXU (one [B,P]x[P,d] matmul, ~0.1 ms at P~2k) and starts the
    # layer-0 beam at the argmin: a strictly better entry than the reference's
    # greedy per-layer descent (which finds a LOCAL minimum of the same point
    # set, ``src/hnsw.rs:1511-1529``), and 3-5 beam iterations cheaper. This is
    # the TPU-native reading of the HNSW hierarchy: upper layers exist to find
    # entry points, and a systolic matmul does that better than pointer hops.
    pivot_ids: Optional[jax.Array] = None  # [P] i32, or None (small graphs)
    # -- static metadata (hashable aux data) --
    n: int = 0  # number of live points
    cap1: int = 0  # padded capacity incl. sink row
    entry_level: int = 0
    layer_nonempty: tuple = ()  # bool per layer: does layer l contain points (level==l)
    metric_name: str = "L2"
    version: int = -1

    def tree_flatten(self):
        children = (self.vectors, self.sqnorms, self.levels, self.layer_ids,
                    self.layer_dists, self.entry, self.pivot_ids)
        aux = (self.n, self.cap1, self.entry_level, self.layer_nonempty,
               self.metric_name, self.version)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_layers(self) -> int:
        return len(self.layer_ids)

    @classmethod
    def from_host(cls, hnsw, with_dists: bool = False, device_dtype=jnp.float32) -> "GraphArrays":
        """Snapshot a host index (``hnsw_tpu.models.hnsw.Hnsw``) to device arrays."""
        n = hnsw._nb_point
        dim = hnsw._dim or 1
        cap1 = _round_up(max(n, 8), 8) + 1  # +1 sink row
        v = np.zeros((cap1, dim), np.float32)
        if n:
            v[:n] = np.asarray(hnsw._data[:n], np.float32)
        levels = np.full(cap1, -1, np.int32)
        levels[:n] = hnsw._level[:n]
        max_layer = max(hnsw._layers.keys(), default=0)
        lids, ldists = [], []
        for l in range(max_layer + 1):
            t = hnsw._layers.get(l)
            w = hnsw._layer_width(l)
            if t is not None:
                w = max(w, t.width)  # repaired graphs carry reserve columns
            ids = np.full((cap1, w), -1, np.int32)
            dd = np.full((cap1, w), np.inf, np.float32)
            if t is not None:
                ids[:n, : t.width] = t.ids[:n]
                dd[:n, : t.width] = t.dists[:n]
            lids.append(jnp.asarray(ids))
            ldists.append(jnp.asarray(dd))
        vec = jnp.asarray(v, dtype=device_dtype)
        nonempty = tuple(bool(hnsw.get_layer_nb_point(l) > 0) for l in range(max_layer + 1))
        pv = compute_pivots(hnsw, lids[0], n)
        pivots = jnp.asarray(pv) if pv is not None else None
        return cls(
            vectors=vec,
            sqnorms=(vec.astype(jnp.float32) ** 2).sum(-1),
            levels=jnp.asarray(levels),
            layer_ids=tuple(lids),
            layer_dists=tuple(ldists) if with_dists else (),
            entry=jnp.int32(hnsw._entry if hnsw._entry >= 0 else 0),
            pivot_ids=pivots,
            n=n,
            cap1=cap1,
            entry_level=hnsw.get_max_level_observed(),
            layer_nonempty=nonempty,
            metric_name=hnsw.metric.name,
            version=hnsw._version,
        )
