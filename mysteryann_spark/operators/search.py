"""Batch best-first beam search — SURVEY.md §2.10 Q1 / §2.3 J2.

``SearchRoarGraph`` (src/index_bipartite.cpp:2311-2420) per query: seed the
bounded queue with the medoid, repeatedly expand the closest unexpanded
node's adjacency, tag visited, stop when the top-L queue has no unexpanded
entry; emit top-k (ids, dists) plus (cmps, hops) cost counters.

Spark shape (broadcast path): the index — CSR adjacency + the base matrix
— is broadcast once per executor; queries stream through ``mapInPandas``
and each runs the sequential beam loop in numpy (per-expansion distance
computation is one vectorized kernel call over the neighbor batch — the
Arrow/numpy stand-in for the AVX loop + prefetch). Per-query visited
tracking is a plain set — the executor-local replacement for the epoch
visited-array pool (visited_list_pool.h), which exists only to amortize
allocation across OS threads.

Scale: this path assumes the index fits in executor memory — the same
assumption the single-node reference makes for its whole lifetime. The
query side is unbounded: 10^9 queries shard into partitions with zero
shuffle (output is already per-query). For indexes beyond executor RAM
the Pregel-style frontier-join rendering in
``operators/search_distributed.py`` is the fallback (SURVEY §3.2),
bit-parity-tested against this path in tests/test_graph.py.
"""

from __future__ import annotations

from bisect import insort
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from mysteryann_spark.functions.vector import np_distances

_RESULT_SCHEMA = StructType(
    [
        StructField("qid", LongType(), False),
        StructField("nn_id", LongType(), False),
        StructField("dist", DoubleType(), False),
        StructField("rank", IntegerType(), False),
        StructField("cmps", IntegerType(), False),
        StructField("hops", IntegerType(), False),
    ]
)


def _build_csr(adj_rows: list, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Adjacency rows (node, nbrs) -> CSR aligned to the base id order."""
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    nbr_lists: list[list[int]] = [[] for _ in range(len(ids))]
    for node, nbrs in adj_rows:
        row = id_to_row.get(int(node))
        if row is not None:
            nbr_lists[row] = [id_to_row[int(n)] for n in nbrs if int(n) in id_to_row]
    indptr = np.zeros(len(ids) + 1, dtype=np.int64)
    for i, lst in enumerate(nbr_lists):
        indptr[i + 1] = indptr[i] + len(lst)
    indices = np.fromiter(
        (x for lst in nbr_lists for x in lst), dtype=np.int64, count=int(indptr[-1])
    )
    return indptr, indices


def _beam_search_one(
    qvec: np.ndarray,
    ep_row: int,
    indptr: np.ndarray,
    indices: np.ndarray,
    bmat: np.ndarray,
    l_search: int,
    metric: str,
    exclude_row: int = -1,
) -> tuple[list[tuple[float, int]], int, int]:
    """One query's best-first loop. Pool entries are (dist, row) kept
    sorted; expanded rows tracked separately — NeighborPriorityQueue
    semantics (neighbor.h:138-223) with the (dist, id) total order."""
    d0 = float(np_distances(metric, qvec[None, :], bmat[ep_row][None, :])[0, 0])
    pool: list[tuple[float, int]] = [(d0, ep_row)]
    expanded: set[int] = set()
    visited: set[int] = {ep_row}
    # cmps counts post-seed distance evaluations only — the reference
    # zeroes its comparison counter after scoring the entry point
    # (SearchRoarGraph, src/index_bipartite.cpp:2311-2420)
    cmps, hops = 0, 0
    while True:
        cur = next(((d, r) for d, r in pool if r not in expanded), None)
        if cur is None:
            break
        expanded.add(cur[1])
        hops += 1
        nbrs = indices[indptr[cur[1]] : indptr[cur[1] + 1]]
        fresh = [n for n in nbrs if n not in visited and n != exclude_row]
        if not fresh:
            continue
        visited.update(fresh)
        batch = np.asarray(fresh, dtype=np.int64)
        dists = np_distances(metric, qvec[None, :], bmat[batch])[0]
        cmps += len(fresh)
        worst = pool[-1][0] if len(pool) >= l_search else np.inf
        for d, r in zip(dists, batch):
            if d < worst or len(pool) < l_search:
                insort(pool, (float(d), int(r)))
                if len(pool) > l_search:
                    dropped = pool.pop()
                    worst = pool[-1][0]
    return pool, cmps, hops


def _beam_search_bipartite_one(
    qvec: np.ndarray,
    seed_rows: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    bmat: np.ndarray,
    l_search: int,
    metric: str,
) -> tuple[list[tuple[float, int]], int, int]:
    """2-hop best-first loop over the bipartite graph
    (SearchBipartiteGraph, src/index_bipartite.cpp:282-356): expanding a
    base node walks base -> query-node -> base, so only base nodes are
    ever scored. Seeds are pre-drawn random base rows."""
    uniq = [int(s) for s in dict.fromkeys(seed_rows.tolist())]
    dists0 = np_distances(metric, qvec[None, :], bmat[np.asarray(uniq)])[0]
    pool = sorted((float(d), r) for d, r in zip(dists0, uniq))[:l_search]
    visited: set[int] = set(uniq)
    expanded: set[int] = set()
    # seed scoring excluded from cmps — reference counter convention
    # (SearchBipartiteGraph, src/index_bipartite.cpp:282-356)
    cmps, hops = 0, 0
    while True:
        cur = next(((d, r) for d, r in pool if r not in expanded), None)
        if cur is None:
            break
        expanded.add(cur[1])
        hops += 1
        fresh: list[int] = []
        for nbr in indices[indptr[cur[1]] : indptr[cur[1] + 1]]:
            for nn2 in indices[indptr[nbr] : indptr[nbr + 1]]:
                if nn2 not in visited:
                    visited.add(nn2)
                    fresh.append(int(nn2))
        if not fresh:
            continue
        batch = np.asarray(fresh, dtype=np.int64)
        dists = np_distances(metric, qvec[None, :], bmat[batch])[0]
        cmps += len(fresh)
        worst = pool[-1][0] if len(pool) >= l_search else np.inf
        for d, r in zip(dists, batch):
            if d < worst or len(pool) < l_search:
                insort(pool, (float(d), int(r)))
                if len(pool) > l_search:
                    pool.pop()
                    worst = pool[-1][0]
    return pool, cmps, hops


def search_bipartite(
    queries_df: DataFrame,
    base_df: DataFrame,
    adj_df: DataFrame,
    base_count: int,
    k: int,
    l_search: int,
    metric: str = "l2",
    n_seeds: int = 10,
    seed: int = 42,
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k search over a bipartite adjacency (build_bipartite output,
    global ID space: base [0, base_count), query nodes above). The
    reference draws its 10 seeds from random_device — nondeterministic by
    design; here they're drawn from a (seed, qid)-keyed generator so runs
    are reproducible (SURVEY.md §5 determinism stance)."""
    spark = base_df.sparkSession
    brows = base_df.select(base_id, vec_col).collect()
    brows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in brows], dtype=np.int64)
    if len(ids) != base_count or ids[0] != 0 or ids[-1] != base_count - 1:
        raise ValueError("bipartite search requires dense base ids [0, base_count)")
    bmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in brows])

    adj_rows = [(int(r[0]), [int(x) for x in r[1]]) for r in adj_df.collect()]
    total = max(base_count, max(n for n, _ in adj_rows) + 1 if adj_rows else 0)
    nbr_lists: list[list[int]] = [[] for _ in range(total)]
    for node, nbrs in adj_rows:
        nbr_lists[node] = nbrs
    indptr = np.zeros(total + 1, dtype=np.int64)
    for i, lst in enumerate(nbr_lists):
        indptr[i + 1] = indptr[i] + len(lst)
    indices = np.fromiter(
        (x for lst in nbr_lists for x in lst), dtype=np.int64, count=int(indptr[-1])
    )
    bc = spark.sparkContext.broadcast((bmat, indptr, indices))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mat, b_indptr, b_indices = bc.value
        for pdf in batches:
            out = {c: [] for c in ("qid", "nn_id", "dist", "rank", "cmps", "hops")}
            for qid, vec in zip(pdf[query_id], pdf[vec_col]):
                qvec = np.asarray(vec, dtype=np.float64)
                rng = np.random.default_rng([seed, int(qid)])
                seeds = rng.integers(0, base_count, size=n_seeds)
                pool, cmps, hops = _beam_search_bipartite_one(
                    qvec, seeds, b_indptr, b_indices, b_mat, l_search, metric
                )
                for rank, (d, row) in enumerate(pool[:k], start=1):
                    out["qid"].append(qid)
                    out["nn_id"].append(row)
                    out["dist"].append(d)
                    out["rank"].append(rank)
                    out["cmps"].append(cmps)
                    out["hops"].append(hops)
            yield pd.DataFrame(out)

    return queries_df.select(query_id, vec_col).mapInPandas(run, _RESULT_SCHEMA)


def search_graph(
    queries_df: DataFrame,
    base_df: DataFrame,
    adj_df: DataFrame,
    entry_point: int,
    k: int,
    l_search: int,
    metric: str = "l2",
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k ANN for every query row; returns
    ``(qid, nn_id, dist, rank, cmps, hops)``."""
    spark = base_df.sparkSession
    brows = base_df.select(base_id, vec_col).collect()
    brows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in brows], dtype=np.int64)
    bmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in brows])
    adj_rows = [(r[0], r[1]) for r in adj_df.collect()]
    indptr, indices = _build_csr(adj_rows, ids)
    ep_row = int(np.searchsorted(ids, entry_point))
    bc = spark.sparkContext.broadcast((ids, bmat, indptr, indices, ep_row))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_indptr, b_indices, b_ep = bc.value
        for pdf in batches:
            out = {c: [] for c in ("qid", "nn_id", "dist", "rank", "cmps", "hops")}
            for qid, vec in zip(pdf[query_id], pdf[vec_col]):
                qvec = np.asarray(vec, dtype=np.float64)
                excl = int(np.searchsorted(b_ids, qid)) if exclude_self else -1
                if excl >= 0 and (excl >= len(b_ids) or b_ids[excl] != qid):
                    excl = -1
                pool, cmps, hops = _beam_search_one(
                    qvec, b_ep, b_indptr, b_indices, b_mat, l_search, metric, excl
                )
                if excl >= 0:
                    # the entry point always seeds the pool — when the query
                    # IS the medoid, its own row must still be dropped here
                    pool = [(d, r) for d, r in pool if r != excl]
                for rank, (d, row) in enumerate(pool[:k], start=1):
                    out["qid"].append(qid)
                    out["nn_id"].append(int(b_ids[row]))
                    out["dist"].append(d)
                    out["rank"].append(rank)
                    out["cmps"].append(cmps)
                    out["hops"].append(hops)
            yield pd.DataFrame(out)

    return queries_df.select(query_id, vec_col).mapInPandas(run, _RESULT_SCHEMA)
