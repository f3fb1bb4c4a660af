"""Engine parameters.

The reference configures builds/searches through a stringly-typed key→value
map (``include/efanna2e/parameters.h:15-57``); we use a plain dataclass with
the same knob names so configurations in the reference's run scripts
(``run_roargraph_test.sh:5-10``: M_sq=100, M_pjbp=35, L_pjpq=500) translate
one-to-one.
"""

from __future__ import annotations

from dataclasses import dataclass

# Metric names follow include/efanna2e/distance.h:15 (L2 / INNER_PRODUCT /
# COSINE are the selectable ones, tests/test_build_roargraph.cpp:85-98).
METRICS = ("l2", "ip", "cosine")

# Degree slack: build adjacency up to SLACK*M wide, cap at merge
# (src/index_bipartite.cpp:26 PROJECTION_SLACK=2, caps at :1031,:1256).
PROJECTION_SLACK = 2


@dataclass(frozen=True)
class IndexParams:
    """RoarGraph build/search parameters (reference parameters.h semantics).

    M_sq     — per-training-query kNN list length used during projection
               (src/index_bipartite.cpp:1063-1067 truncation).
    M_pjbp   — target projection-graph degree (adjacency cap 2*M_pjbp).
    L_pjpq   — beam width during build-time search (connectivity phase).
    k        — top-k returned by search.
    L_pq     — beam width during search (>= k).
    metric   — 'l2' | 'ip' | 'cosine'.
    seed     — RNG seed for any sampled choice (GenRandom util.h:21-35).
    """

    M_sq: int = 10
    M_pjbp: int = 8
    L_pjpq: int = 32
    k: int = 10
    L_pq: int = 32
    metric: str = "l2"
    seed: int = 42

    def __post_init__(self) -> None:
        if self.metric not in METRICS:
            raise ValueError(f"metric must be one of {METRICS}, got {self.metric!r}")
        if self.L_pq < self.k:
            raise ValueError("L_pq must be >= k")

    @property
    def degree_cap(self) -> int:
        return PROJECTION_SLACK * self.M_pjbp
