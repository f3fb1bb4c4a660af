"""Occlusion-prune kernel vs an independent naive implementation.

The naive check re-states the reference rule (src/index_bipartite.cpp:
1637-1656) directly: scanning candidates in (dist, id) order, c is kept
iff no earlier-kept r has d(c, r) < d(c, tgt); then nearest-first backfill.
"""

import numpy as np

from mysteryann_spark.functions.vector import np_distances
from mysteryann_spark.operators.prune import occlusion_prune_np


def naive_prune(ids, dists, vecs, m, metric="l2"):
    order = sorted(range(len(ids)), key=lambda i: (dists[i], ids[i]))
    kept = []
    for i in order:
        if len(kept) >= m:
            break
        ok = True
        for j in kept:
            d_ij = np_distances(metric, vecs[i][None], vecs[j][None])[0, 0]
            if d_ij < dists[i]:
                ok = False
                break
        if ok:
            kept.append(i)
    for i in order:
        if len(kept) >= m:
            break
        if i not in kept:
            kept.append(i)
    return [int(ids[i]) for i in kept]


def test_prune_matches_naive():
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(3, 60))
        vecs = rng.normal(size=(n, 16))
        tgt = rng.normal(size=(1, 16))
        ids = rng.choice(10_000, size=n, replace=False).astype(np.int64)
        dists = np_distances("l2", tgt, vecs)[0]
        m = int(rng.integers(2, 12))
        got = occlusion_prune_np(ids, dists, vecs, m, "l2")
        want = naive_prune(ids, dists, vecs, m)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_prune_dedups_and_caps():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(10, 8))
    ids = np.array([5, 5, 7, 8, 9, 9, 11, 12, 13, 14], dtype=np.int64)
    tgt = rng.normal(size=(1, 8))
    dists = np_distances("l2", tgt, vecs)[0]
    out = occlusion_prune_np(ids, dists, vecs, 4, "l2")
    assert len(out) == 4
    assert len(set(out)) == 4


def test_prune_empty():
    assert occlusion_prune_np(
        np.array([], dtype=np.int64), np.array([]), np.zeros((0, 4)), 5
    ) == []


# --- hypothesis property tests ---------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def pools(draw):
    n = draw(st.integers(1, 40))
    dim = draw(st.integers(2, 12))
    flat = draw(
        st.lists(
            st.floats(-8, 8, allow_nan=False, width=32),
            min_size=n * dim, max_size=n * dim,
        )
    )
    vecs = np.array(flat, dtype=np.float64).reshape(n, dim)
    ids = np.array(draw(st.permutations(range(n))), dtype=np.int64)
    m = draw(st.integers(1, 16))
    return ids, vecs, m


@given(pools())
@settings(max_examples=60, deadline=None)
def test_prune_properties(pool):
    """Invariants for ANY pool: kept ⊆ input, deduped, |kept| = min(m,
    distinct), metric-equal to the naive restatement, and the closest
    candidate always survives."""
    ids, vecs, m = pool
    tgt = np.zeros((1, vecs.shape[1]))
    dists = np_distances("l2", tgt, vecs)[0]
    got = occlusion_prune_np(ids, dists, vecs, m, "l2")
    assert set(got) <= set(ids.tolist())
    assert len(got) == len(set(got)) == min(m, len(set(ids.tolist())))
    assert got == naive_prune(ids, dists, vecs, m)
    first = min(zip(dists, ids))[1]
    assert int(first) in got
