"""Deterministic level sampling.

Reproduces the *law* of the reference's ``LayerGenerator`` (reference
``src/hnsw.rs:317-386``): levels follow ``floor(-ln(U) * scale)`` with
``scale = 1/ln(max_nb_connection)`` (optionally multiplied by a modification factor
clamped to [0.2, 1.0], reference ``src/hnsw.rs:876-905``), and samples landing at or
above ``max_layer`` are redrawn uniformly in ``[0, max_layer)``.

The reference seeds a shared StdRng from ``Xoshiro256PlusPlus::seed_from_u64(397)``
(``src/hnsw.rs:329-331``) so builds are reproducible run-to-run; we keep the same
deterministic-by-default contract with numpy's PCG64 at the same seed value. Bit-exact
sequences across the two libraries are neither possible nor needed — only the law and
determinism are part of the behavioral contract.
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_SEED = 397


class LevelSampler:
    def __init__(self, max_nb_connection: int, max_layer: int, seed: int = DEFAULT_SEED,
                 scale: float | None = None):
        self.max_layer = int(max_layer)
        self._default_scale = 1.0 / math.log(float(max_nb_connection))
        self.scale = float(scale) if scale is not None else self._default_scale
        self._rng = np.random.Generator(np.random.PCG64(seed))

    def set_scale_modification(self, factor: float) -> None:
        # reference clamps the factor to [0.2, 1.0] (src/hnsw.rs:888-893)
        factor = min(1.0, max(0.2, float(factor)))
        self.scale = self._default_scale * factor

    def get_scale(self) -> float:
        return self.scale

    def generate(self, n: int = 1) -> np.ndarray:
        """Sample ``n`` insertion levels. Vectorized (one RNG draw batch) so batched
        device insert rounds and the serial path share one deterministic stream."""
        u = self._rng.random(n)
        levels = np.floor(-np.log(np.maximum(u, 1e-300)) * self.scale).astype(np.int64)
        over = levels >= self.max_layer
        if over.any():
            levels[over] = self._rng.integers(0, self.max_layer, size=int(over.sum()))
        return levels

    def generate_one(self) -> int:
        return int(self.generate(1)[0])
