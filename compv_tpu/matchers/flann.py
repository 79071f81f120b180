"""FLANN matcher — parity stub.

The reference's FLANN matcher is itself an empty 5-line stub
(core/matchers/compv_core_core_matcher_flann.cxx:1-5, never registered).
On TPU the exact brute-force popcount-GEMM (matchers/bruteforce.py) at
realistic descriptor counts is faster than approximate trees would be, and
ml/knn.py provides exact float KNN — so approximate indexing has no
performance role here. `match` delegates to brute force for API parity.
"""
from __future__ import annotations

from ..core.registry import register
from ..core.types import Descriptors, Matches
from . import bruteforce


def match(query: Descriptors, train: Descriptors, knn: int = 2) -> Matches:
    """Exact matching (a strict upgrade over approximate FLANN results)."""
    return bruteforce.match(query, train, knn=knn)


@register("matcher", "flann")
def make_flann(config=None):
    def run(query: Descriptors, train: Descriptors) -> Matches:
        return match(query, train)
    return run
