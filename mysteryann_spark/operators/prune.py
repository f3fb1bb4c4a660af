"""Occlusion (RNG-style, alpha=1) prune — SURVEY.md §2.9 G6/G7/G9.

Numpy re-expression of the reference's candidate-pruning rule
(PruneBiSearchBaseGetBase, src/index_bipartite.cpp:1612-1694): given a
candidate pool for a target node, sorted by (distance-to-target, id), keep
candidate c only if no already-kept r satisfies d(c, r) < d(c, target);
then backfill nearest non-kept candidates up to M. All pools are small
(<= a few hundred), so the kernel is a local O(M*|pool|) numpy loop inside
``applyInPandas`` — per-group work, never a Spark shuffle.

The reference's three passes (sorted pool, original-order slack pass with
alpha=1.0, nearest backfill) collapse to two here because our callers
always present pools already (dist, id)-sorted and deduplicated, which
makes pass 2 a no-op re-scan of pass 1's input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from mysteryann_spark.functions.vector import np_distances


def occlusion_prune_np(
    cand_ids: np.ndarray,
    cand_dists: np.ndarray,
    cand_vecs: np.ndarray,
    m: int,
    metric: str = "l2",
    pool_cap: int | None = None,
) -> list[int]:
    """Prune one pool. Inputs must exclude the target itself.

    cand_ids/cand_dists/cand_vecs are parallel arrays; dists are to the
    target node. Returns <= m kept ids, deterministic.

    ``pool_cap`` (default ``max(8*m, 256)``) bounds the pool considered:
    after the (dist, id) sort + dedup, only the nearest ``pool_cap``
    candidates enter the O(pool^2) occlusion pass. The batch build's
    merged per-target pools are otherwise UNBOUNDED — a hub node that is
    the 1-NN target of thousands of training queries accumulates
    thousands of candidates, and the full pairwise-distance matrix on
    such a pool is the quadratic memory/CPU blowup that stalls (or
    OOM-kills) workers on clustered data. Truncating to the nearest
    pool_cap is the standard Vamana/DiskANN regime (prune pools are
    bounded by the build beam L); occlusion keeps <= m anyway, and the
    reference's own pools are bounded by construction
    (src/index_bipartite.cpp:1063-1067 M-truncation per query).
    """
    if len(cand_ids) == 0:
        return []
    if pool_cap is None:
        pool_cap = max(8 * m, 256)
    # (dist, id) total order — neighbor.h:29-31 tiebreak.
    order = np.lexsort((cand_ids, cand_dists))
    ids = cand_ids[order]
    dists = cand_dists[order]
    vecs = cand_vecs[order]
    # dedup keeping first (closest) occurrence
    _, first_idx = np.unique(ids, return_index=True)
    keep_mask = np.zeros(len(ids), dtype=bool)
    keep_mask[first_idx] = True
    ids, dists, vecs = ids[keep_mask], dists[keep_mask], vecs[keep_mask]
    # re-sort after dedup (np.unique disturbed nothing: mask preserves order)
    if len(ids) > pool_cap:
        ids, dists, vecs = ids[:pool_cap], dists[:pool_cap], vecs[:pool_cap]

    pair = np_distances(metric, vecs, vecs)  # (n, n) candidate-candidate dists
    kept: list[int] = [0]
    for j in range(1, len(ids)):
        if len(kept) >= m:
            break
        # occluded if any kept r with d(c_j, r) < d(c_j, tgt)
        if not np.any(pair[j, kept] < dists[j]):
            kept.append(j)
    if len(kept) < m:
        kept_set = set(kept)
        for j in range(len(ids)):
            if len(kept) >= m:
                break
            if j not in kept_set:
                kept.append(j)
    return [int(ids[j]) for j in kept]


_ADJ_SCHEMA = StructType(
    [
        StructField("node", LongType(), False),
        StructField("nbrs", ArrayType(LongType()), False),
    ]
)


def prune_candidates(
    cand_df: DataFrame,
    base_df: DataFrame,
    m: int,
    metric: str = "l2",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    staged_base: str | list[str] | None = None,
) -> DataFrame:
    """Distributed prune: ``(node, cand_id)`` pairs -> ``(node, nbrs)``.

    The shuffle carries BARE (node, cand_id) longs; the kernel looks both
    the pool's vectors and the target's vector up in a STAGED base matrix
    (sources/staging.py — loaded once per worker, the same regime as the
    beam search). The earlier form joined a 64-float vector onto every
    edge row before the collect_list, which multiplied the dominant build
    shuffle ~25x: at 10^6 nodes the phase-4/5 merged prune carried
    ~1.9x10^8 vector-fattened rows (~70+ GB) into one sort and filled the
    disk with spills (scale hazard #6). Pools assemble JVM-side
    (collect_list of longs), THEN cross into Python once per Arrow batch;
    pool completeness is guaranteed by the groupBy, and the kernel dedups
    each pool (np.unique keeps the closest occurrence) so duplicate pairs
    only fatten collect_list slightly.

    ``staged_base`` lets one caller (the 5-phase build) stage the base
    once and share it across its three prune calls; a LIST of paths is
    the StagedBase incremental form (concatenated, later paths override
    duplicate ids — maintenance loops append per-batch deltas instead of
    re-staging the whole base). The staged set may be a superset of
    ``base_df``: lookups are by id, so extra rows are inert. Per-worker
    residency is the base matrix (id-sorted float64 + searchsorted
    lookups) — the same executor-memory assumption the staged search
    index already makes, and ~n*dim*8 bytes vs the O(edges*dim) shuffle
    it replaces.
    """
    from mysteryann_spark.sources.staging import (
        load_staged_matrix,
        stage_parquet,
    )

    if staged_base is None:
        staged_base = stage_parquet(base_df.select(base_id, vec_col))
    paths = [staged_base] if isinstance(staged_base, str) else list(staged_base)

    pools = (
        cand_df.where(F.col("cand_id") != F.col("node"))
        .groupBy("node")
        .agg(F.collect_list("cand_id").alias("cand_ids"))
    )

    def prune_batch(batches) -> "pd.DataFrame":
        # incremental: a previously-built chain prefix is patched with the
        # suffix deltas (staging.load_staged_matrix) — per-batch refresh
        # cost follows the batch, not the staged set
        all_ids, mat = load_staged_matrix(paths, base_id, vec_col)

        def rows_of(wanted: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(all_ids, wanted)
            if np.any(pos >= len(all_ids)) or np.any(all_ids[pos] != wanted):
                missing = wanted[(pos >= len(all_ids)) | (all_ids[np.minimum(pos, len(all_ids) - 1)] != wanted)]
                raise ValueError(f"prune pool references ids absent from the base: {missing[:5]}")
            return pos

        for pdf in batches:
            out_nodes, out_nbrs = [], []
            node_rows = rows_of(pdf["node"].to_numpy(dtype=np.int64))
            for node, nrow, cids in zip(pdf["node"], node_rows, pdf["cand_ids"]):
                ids = np.asarray(cids, dtype=np.int64)
                vecs = mat[rows_of(ids)]
                tgt = mat[nrow][None, :]
                dists = np_distances(metric, tgt, vecs)[0]
                out_nodes.append(node)
                out_nbrs.append(occlusion_prune_np(ids, dists, vecs, m, metric))
            yield pd.DataFrame({"node": out_nodes, "nbrs": out_nbrs})

    return pools.mapInPandas(prune_batch, _ADJ_SCHEMA)
