"""Search-time filters.

Capability analog of the reference's ``FilterT`` trait (``src/filter.rs:7-9``) with its
two blanket impls — sorted id lists via binary search (``src/filter.rs:11-15``) and
arbitrary closures (``src/filter.rs:17-24``) — plus the array-native form the batched
device path needs: a boolean mask over *external* ids resolved to internal indices.

Filters are evaluated DURING the search (pre-admission to the result set), not as a
post-filter, exactly like the reference.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


class FilterT:
    """Subclass and implement :meth:`hnsw_filter` for custom filters (the reference
    README suggests users impl FilterT on e.g. bitvectors, ``README.md:34-35``)."""

    def hnsw_filter(self, data_id: int) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def mask_for(self, origin_ids: np.ndarray) -> np.ndarray:
        """Vectorized form for the device path: bool mask aligned with origin_ids."""
        return np.fromiter((self.hnsw_filter(int(i)) for i in origin_ids),
                           dtype=bool, count=len(origin_ids))


class SortedIdFilter(FilterT):
    """Membership in a sorted external-id list (reference ``impl FilterT for
    Vec<usize>``, binary search)."""

    def __init__(self, ids):
        self.ids = np.asarray(sorted(int(i) for i in ids), dtype=np.int64)

    def hnsw_filter(self, data_id: int) -> bool:
        j = int(np.searchsorted(self.ids, data_id))
        return j < len(self.ids) and int(self.ids[j]) == int(data_id)

    def mask_for(self, origin_ids: np.ndarray) -> np.ndarray:
        j = np.searchsorted(self.ids, origin_ids)
        j = np.clip(j, 0, len(self.ids) - 1)
        return (self.ids[j] == origin_ids) if len(self.ids) else np.zeros(len(origin_ids), bool)


class CallableFilter(FilterT):
    """Arbitrary predicate over external ids (closure impl of the reference)."""

    def __init__(self, fn: Callable[[int], bool]):
        self.fn = fn

    def hnsw_filter(self, data_id: int) -> bool:
        return bool(self.fn(int(data_id)))


def resolve_filter(filter) -> Optional[Callable[[int], bool]]:
    """Normalize any accepted filter form to a per-id predicate (or None)."""
    if filter is None:
        return None
    if isinstance(filter, FilterT):
        return filter.hnsw_filter
    if callable(filter):
        return lambda i: bool(filter(i))
    # list / array of ids
    f = SortedIdFilter(filter)
    return f.hnsw_filter


def filter_mask(filter, origin_ids: np.ndarray) -> Optional[np.ndarray]:
    """Bool mask over a vector of external ids, for the batched device search."""
    if filter is None:
        return None
    if isinstance(filter, FilterT):
        return filter.mask_for(origin_ids)
    if callable(filter):
        return np.fromiter((bool(filter(int(i))) for i in origin_ids), dtype=bool,
                           count=len(origin_ids))
    return SortedIdFilter(filter).mask_for(origin_ids)
