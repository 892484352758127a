"""Batched device insertion rounds (placeholder — serial fallback).

The real synchronized-round implementation (SURVEY.md §7.2 step 4) lands next: rounds
of B points descend/search/select/reverse-link as one jitted program. Until then,
device-mode parallel_insert loops the exact serial oracle so the API surface is
complete and correct."""

from __future__ import annotations


def device_parallel_insert(hnsw, pairs, batch_size=None):
    for v, i in pairs:
        hnsw.insert(v, i)
