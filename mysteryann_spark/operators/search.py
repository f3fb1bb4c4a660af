"""Batch best-first beam search — SURVEY.md §2.10 Q1 / §2.3 J2.

``SearchRoarGraph`` (src/index_bipartite.cpp:2311-2420) per query: seed the
bounded queue with the medoid, repeatedly expand the closest unexpanded
node's adjacency, tag visited, stop when the top-L queue has no unexpanded
entry; emit top-k (ids, dists) plus (cmps, hops) cost counters.

Spark shape (broadcast path): the index — CSR adjacency + the base matrix
— is staged ONCE to Parquet by a distributed write and loaded lazily by
each Python worker (sources/staging.py; no driver collect round-trip);
queries stream through ``mapInPandas`` and run the lockstep beam loop in
numpy (per-round distance computation is one vectorized kernel call over
every live query's neighbor batch — the Arrow/numpy stand-in for the AVX
loop + prefetch). Per-query visited tracking is a plain set — the
executor-local replacement for the epoch visited-array pool
(visited_list_pool.h), which exists only to amortize allocation across
OS threads.

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

from mysteryann_spark.functions.vector import np_pair_distances
from mysteryann_spark.sources.staging import (
    load_staged,
    load_staged_graph,
    read_staged,
    read_staged_multi,
    stage_parquet,
    staged_matrix,
    table_csr,
    table_matrix,
)


def stage_graph_index(
    base_df: DataFrame,
    adj_df: DataFrame,
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    storage_dir: str | None = None,
) -> tuple[str, str]:
    """Stage the (base vectors, adjacency) index pair to Parquet once via
    distributed writes; callers running several searches over one index
    (sweeps, repeated queries) pass the result to ``search_graph`` so the
    write and the per-worker load both happen once."""
    return (
        stage_parquet(base_df.select(base_id, vec_col), storage_dir),
        stage_parquet(adj_df, storage_dir),
    )

# lockstep batch width for the shared-distance-call beam search: big
# enough that one einsum round amortizes numpy call overhead, small
# enough that per-round Python state (pools + visited sets) stays cheap
_BATCH_CHUNK = 256

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


def _beam_search_batch(
    qmat: np.ndarray,
    ep_row: int,
    indptr: np.ndarray,
    indices: np.ndarray,
    bmat: np.ndarray,
    l_search: int,
    metric: str,
    exclude_rows: np.ndarray,
    expand_width: int = 1,
) -> tuple[list[list[tuple[float, int]]], np.ndarray, np.ndarray]:
    """Best-first loop for a BATCH of queries in lockstep. Per query the
    state evolution is identical to running the sequential loop alone —
    pool entries are (dist, row) kept sorted, expanded rows tracked
    separately: NeighborPriorityQueue semantics (neighbor.h:138-223) with
    the (dist, id) total order. Lockstep exists purely to amortize the
    distance kernel: each round gathers every live query's one frontier
    expansion and scores all (query, neighbor) pairs with a single
    row-wise einsum call, instead of one numpy call per (query, hop) —
    the per-call overhead was the #1 cost of the graph build's
    connectivity phase.

    ``expand_width`` > 1 expands up to that many unexpanded pool entries
    per round INSTEAD of the strict best-first one: round count (and with
    it the per-round Python bookkeeping that dominates long searches at
    large L) drops ~width-fold, at the cost of scoring some neighbors a
    strict order would have pruned. Width 1 (default) is bit-identical
    to the reference's loop; wider is the standard batched-greedy
    relaxation, recall-gated where used (the 10^5-node rehearsal).

    cmps counts post-seed distance evaluations only — the reference
    zeroes its comparison counter after scoring the entry point
    (SearchRoarGraph, src/index_bipartite.cpp:2311-2420).

    Returns (pools, cmps, hops) with one entry per query row.
    """
    n_q = qmat.shape[0]
    d0 = np_pair_distances(metric, qmat, np.broadcast_to(bmat[ep_row], qmat.shape))
    pools: list[list[tuple[float, int]]] = [[(float(d0[i]), int(ep_row))] for i in range(n_q)]
    expanded: list[set[int]] = [set() for _ in range(n_q)]
    visited: list[set[int]] = [{int(ep_row)} for _ in range(n_q)]
    cmps = np.zeros(n_q, dtype=np.int64)
    hops = np.zeros(n_q, dtype=np.int64)
    live = list(range(n_q))
    while live:
        nxt: list[int] = []
        owners: list[tuple[int, int]] = []  # (query idx, n fresh)
        fresh_all: list[int] = []
        for i in live:
            pool, exp = pools[i], expanded[i]
            curs = []
            for d, r in pool:
                if r not in exp:
                    curs.append(r)
                    if len(curs) >= expand_width:
                        break
            if not curs:
                continue  # pool fully expanded -> query done
            nxt.append(i)
            vis, ex = visited[i], exclude_rows[i]
            fresh: list[int] = []
            for r in curs:
                exp.add(r)
                hops[i] += 1
                for n in indices[indptr[r] : indptr[r + 1]]:
                    if n not in vis and n != ex:
                        vis.add(n)
                        fresh.append(n)
            if fresh:
                owners.append((i, len(fresh)))
                fresh_all.extend(fresh)
        live = nxt
        if not fresh_all:
            continue
        rows = np.asarray(fresh_all, dtype=np.int64)
        qidx = np.repeat(
            np.fromiter((i for i, _ in owners), dtype=np.int64, count=len(owners)),
            np.fromiter((nf for _, nf in owners), dtype=np.int64, count=len(owners)),
        )
        dists = np_pair_distances(metric, qmat[qidx], bmat[rows])
        off = 0
        for i, nf in owners:
            ds, rs = dists[off : off + nf], rows[off : off + nf]
            off += nf
            cmps[i] += nf
            pool = pools[i]
            worst = pool[-1][0] if len(pool) >= l_search else np.inf
            for d, r in zip(ds, rs):
                if d < worst or len(pool) < l_search:
                    insort(pool, (float(d), int(r)))
                    if len(pool) > l_search:
                        pool.pop()
                        worst = pool[-1][0]
    return pools, cmps, hops


def _beam_search_bipartite_batch(
    qmat: np.ndarray,
    seed_rows_list: list[list[int]],
    indptr: np.ndarray,
    indices: np.ndarray,
    bmat: np.ndarray,
    l_search: int,
    metric: str,
) -> tuple[list[list[tuple[float, int]]], np.ndarray, np.ndarray]:
    """2-hop best-first loop over the bipartite graph for a BATCH of
    queries in lockstep (SearchBipartiteGraph,
    src/index_bipartite.cpp:282-356): expanding a base node walks
    base -> query-node -> base, so only base nodes are ever scored.
    Seeds are pre-drawn random base rows; per query the state evolution
    is identical to running its loop alone — lockstep only shares the
    per-round distance kernel call (see _beam_search_batch).

    cmps excludes seed scoring — the reference's counter convention.
    """
    n_q = qmat.shape[0]
    uniq_list = [list(dict.fromkeys(s)) for s in seed_rows_list]
    seed_qidx = np.repeat(
        np.arange(n_q, dtype=np.int64),
        np.fromiter((len(u) for u in uniq_list), dtype=np.int64, count=n_q),
    )
    seed_flat = np.fromiter(
        (r for u in uniq_list for r in u), dtype=np.int64, count=len(seed_qidx)
    )
    seed_d = np_pair_distances(metric, qmat[seed_qidx], bmat[seed_flat])
    pools: list[list[tuple[float, int]]] = []
    off = 0
    for u in uniq_list:
        ds = seed_d[off : off + len(u)]
        off += len(u)
        pools.append(sorted((float(d), int(r)) for d, r in zip(ds, u))[:l_search])
    visited: list[set[int]] = [set(u) for u in uniq_list]
    expanded: list[set[int]] = [set() for _ in range(n_q)]
    cmps = np.zeros(n_q, dtype=np.int64)
    hops = np.zeros(n_q, dtype=np.int64)
    live = list(range(n_q))
    while live:
        nxt: list[int] = []
        owners: list[tuple[int, int]] = []
        fresh_all: list[int] = []
        for i in live:
            pool, exp = pools[i], expanded[i]
            cur = next(((d, r) for d, r in pool if r not in exp), None)
            if cur is None:
                continue
            nxt.append(i)
            exp.add(cur[1])
            hops[i] += 1
            vis = visited[i]
            fresh: list[int] = []
            for nbr in indices[indptr[cur[1]] : indptr[cur[1] + 1]]:
                for nn2 in indices[indptr[nbr] : indptr[nbr + 1]]:
                    if nn2 not in vis:
                        vis.add(nn2)
                        fresh.append(int(nn2))
            if fresh:
                owners.append((i, len(fresh)))
                fresh_all.extend(fresh)
        live = nxt
        if not fresh_all:
            continue
        rows = np.asarray(fresh_all, dtype=np.int64)
        qidx = np.repeat(
            np.fromiter((i for i, _ in owners), dtype=np.int64, count=len(owners)),
            np.fromiter((nf for _, nf in owners), dtype=np.int64, count=len(owners)),
        )
        dists = np_pair_distances(metric, qmat[qidx], bmat[rows])
        off = 0
        for i, nf in owners:
            ds, rs = dists[off : off + nf], rows[off : off + nf]
            off += nf
            cmps[i] += nf
            pool = pools[i]
            worst = pool[-1][0] if len(pool) >= l_search else np.inf
            for d, r in zip(ds, rs):
                if d < worst or len(pool) < l_search:
                    insort(pool, (float(d), int(r)))
                    if len(pool) > l_search:
                        pool.pop()
                        worst = pool[-1][0]
    return pools, cmps, hops


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
    are reproducible (SURVEY.md §5 determinism stance). The index stages
    to Parquet and loads executor-side (sources/staging.py)."""
    base_path = stage_parquet(base_df.select(base_id, vec_col))
    adj_path = stage_parquet(adj_df)

    def _build():
        ids, bmat = table_matrix(read_staged(base_path), base_id, vec_col)
        if len(ids) != base_count or ids[0] != 0 or ids[-1] != base_count - 1:
            raise ValueError("bipartite search requires dense base ids [0, base_count)")
        adj_tbl = read_staged(adj_path)
        node_ids = adj_tbl["node"].combine_chunks().to_numpy(zero_copy_only=False)
        total = max(base_count, int(node_ids.max()) + 1 if len(node_ids) else 0)
        # the bipartite graph's id space is dense [0, total): align the CSR
        # to the identity id vector (vectorized — no per-node Python loop)
        indptr, indices = table_csr(adj_tbl, np.arange(total, dtype=np.int64))
        return bmat, indptr, indices

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mat, b_indptr, b_indices = load_staged(base_path + "|" + adj_path, _build)
        for pdf in batches:
            if pdf.empty:
                continue
            out = {c: [] for c in ("qid", "nn_id", "dist", "rank", "cmps", "hops")}
            for s in range(0, len(pdf), _BATCH_CHUNK):
                sub = pdf.iloc[s : s + _BATCH_CHUNK]
                qids = sub[query_id].to_numpy()
                qmat = np.stack([np.asarray(v, dtype=b_mat.dtype) for v in sub[vec_col]])
                seeds = [
                    [int(x) for x in np.random.default_rng([seed, int(qid)]).integers(
                        0, base_count, size=n_seeds)]
                    for qid in qids
                ]
                pools, cmps, hops = _beam_search_bipartite_batch(
                    qmat, seeds, b_indptr, b_indices, b_mat, l_search, metric
                )
                for j, qid in enumerate(qids):
                    for rank, (d, row) in enumerate(pools[j][:k], start=1):
                        out["qid"].append(qid)
                        out["nn_id"].append(row)
                        out["dist"].append(d)
                        out["rank"].append(rank)
                        out["cmps"].append(int(cmps[j]))
                        out["hops"].append(int(hops[j]))
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
    staged: tuple[str | list[str], str | list[str]] | None = None,
    expand_width: int = 1,
) -> DataFrame:
    """Top-k ANN for every query row; returns
    ``(qid, nn_id, dist, rank, cmps, hops)``.

    ``staged``: optional ``(base_path(s), adj_path(s))`` from
    ``stage_graph_index`` — repeated searches over one index (sweeps)
    stage once and reuse. EITHER side may be a LIST of staged paths
    (StagedBase incremental form: concatenated, later paths override
    duplicate ids/nodes; a base superset of the live graph is allowed —
    extra rows are never reachable). The adjacency delta form is the
    maintenance loop's path to per-batch staging cost ∝ |batch|: the
    full graph stages once, each batch appends only its changed rows
    (``read_staged_multi`` merges worker-side). ``expand_width``: beam
    entries expanded per lockstep round (1 = reference-strict
    best-first; see _beam_search_batch).
    """
    if staged is None:
        staged = stage_graph_index(base_df, adj_df, base_id=base_id, vec_col=vec_col)
    base_path, adj_path = staged
    base_paths = [base_path] if isinstance(base_path, str) else list(base_path)
    adj_paths = [adj_path] if isinstance(adj_path, str) else list(adj_path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # incremental worker artifact: a previously-built chain prefix is
        # PATCHED with the suffix deltas instead of re-reading the whole
        # chain from parquet (sources/staging.load_staged_graph) — the
        # per-batch maintenance refresh follows the batch, not the graph
        b_ids, b_mat, b_indptr, b_indices = load_staged_graph(
            base_paths, adj_paths, base_id, vec_col
        )
        b_ep = int(np.searchsorted(b_ids, entry_point))
        for pdf in batches:
            if pdf.empty:
                continue
            out = {c: [] for c in ("qid", "nn_id", "dist", "rank", "cmps", "hops")}
            # lockstep chunks bound per-round state while keeping the
            # shared distance call large enough to amortize
            for s in range(0, len(pdf), _BATCH_CHUNK):
                sub = pdf.iloc[s : s + _BATCH_CHUNK]
                qids = sub[query_id].to_numpy()
                qmat = np.stack([np.asarray(v, dtype=b_mat.dtype) for v in sub[vec_col]])
                if exclude_self:
                    excl = np.searchsorted(b_ids, qids)
                    in_range = excl < len(b_ids)
                    excl = np.where(
                        in_range & (b_ids[np.minimum(excl, len(b_ids) - 1)] == qids),
                        excl,
                        -1,
                    )
                else:
                    excl = np.full(len(sub), -1, dtype=np.int64)
                pools, cmps, hops = _beam_search_batch(
                    qmat, b_ep, b_indptr, b_indices, b_mat, l_search, metric, excl,
                    expand_width=expand_width,
                )
                for j, qid in enumerate(qids):
                    pool = pools[j]
                    if excl[j] >= 0:
                        # the entry point always seeds the pool — when the
                        # query IS the medoid, its row must still drop here
                        pool = [(d, r) for d, r in pool if r != excl[j]]
                    for rank, (d, row) in enumerate(pool[:k], start=1):
                        out["qid"].append(qid)
                        out["nn_id"].append(int(b_ids[row]))
                        out["dist"].append(d)
                        out["rank"].append(rank)
                        out["cmps"].append(int(cmps[j]))
                        out["hops"].append(int(hops[j]))
            yield pd.DataFrame(out)

    return queries_df.select(query_id, vec_col).mapInPandas(run, _RESULT_SCHEMA)
