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
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
    # -- static metadata (hashable aux data) --
    n: int = 0  # number of live points
    cap1: int = 0  # padded capacity incl. sink row
    entry_level: int = 0
    layer_nonempty: tuple = ()  # bool per layer: does layer l contain points (level==l)
    metric_name: str = "L2"
    version: int = -1

    def tree_flatten(self):
        children = (self.vectors, self.sqnorms, self.levels, self.layer_ids,
                    self.layer_dists, self.entry)
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
            ids = np.full((cap1, w), -1, np.int32)
            dd = np.full((cap1, w), np.inf, np.float32)
            if t is not None:
                ids[:n, : t.width] = t.ids[:n]
                dd[:n, : t.width] = t.dists[:n]
            lids.append(jnp.asarray(ids))
            ldists.append(jnp.asarray(dd))
        vec = jnp.asarray(v, dtype=device_dtype)
        nonempty = tuple(bool(hnsw.get_layer_nb_point(l) > 0) for l in range(max_layer + 1))
        return cls(
            vectors=vec,
            sqnorms=(vec.astype(jnp.float32) ** 2).sum(-1),
            levels=jnp.asarray(levels),
            layer_ids=tuple(lids),
            layer_dists=tuple(ldists) if with_dists else (),
            entry=jnp.int32(hnsw._entry if hnsw._entry >= 0 else 0),
            n=n,
            cap1=cap1,
            entry_level=hnsw.get_max_level_observed(),
            layer_nonempty=nonempty,
            metric_name=hnsw.metric.name,
            version=hnsw._version,
        )
