"""Ray genealogy facade over the engine's per-bounce records.

Capability parity with the reference's tracer/trace_tree.py (RayTree :6 with
append/ordered_parents/ray_history). The fixed-slab engine makes genealogy
trivial: slot i at bounce b descends from slot i at bounce b-1, so no parent
index bookkeeping is needed; this class exposes the same queries on top of a
TraceResult.
"""
from __future__ import annotations

from typing import List

import numpy as np


class RayTree:
    """Bounce-level view of a TraceResult (ref RayTree semantics)."""

    def __init__(self, result):
        self._res = result

    @property
    def num_bunds(self) -> int:
        """Number of recorded bounce levels (+1 for the source)."""
        return len(self._res.records) + 1

    def ordered_parents(self, level: int) -> np.ndarray:
        """Parent indices of rays at a bounce level — identity in the
        fixed-slab design (ref ordered_parents :27)."""
        n = self._res.source.num_rays
        return np.arange(n)

    def ray_history(self, slot: int, level: int = None) -> List[dict]:
        """Walk one ray from the source through its bounces
        (ref ray_history :34). Returns per-bounce dicts with sid, hit
        point and energies."""
        hist = self._res.ray_history(slot)
        if level is not None:
            hist = hist[: level + 1]
        return hist

    def bounce(self, level: int):
        """The BounceRecord at a level (the analog of _bunds[level])."""
        return self._res.records[level]
