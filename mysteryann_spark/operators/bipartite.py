"""Bipartite graph construction + degree statistics — SURVEY.md §2.9 G5, §2.4 A2.

``qbaseNNbipartite`` (src/index_bipartite.cpp:235-280) builds the bipartite
adjacency straight from per-query kNN lists:

- forward: training-query node  -> each of its top-M neighbors EXCEPT any
  occurrence of its 1-NN (the chosen target),
- reverse: the 1-NN base node  -> the query node.

Query nodes live at ids ``base_count + qid`` (the reference's single global
ID space, src/index_bipartite.cpp:55-58,268).

This is pure DataFrame algebra — explode + union + groupBy — no UDF. At
scale the explode is map-side only; the single shuffle is the final
groupBy(node) that assembles adjacency lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_bipartite(knn_df: DataFrame, m: int, base_count: int) -> DataFrame:
    """knn_df: ``(qid, nn ARRAY<BIGINT>)`` rank-ordered exact kNN lists.

    Returns adjacency ``(node, nbrs ARRAY<BIGINT>)`` over the global ID
    space; neighbor lists are (rank-order preserved for queries, id-sorted
    for reverse edges) deduplicated.
    """
    lists = knn_df.select(
        (F.col("qid") + F.lit(base_count)).alias("qnode"),
        F.slice("nn", 1, m).alias("nn"),
    ).where(F.size("nn") > 0)
    tgt = F.element_at("nn", 1)
    # forward: query-node -> nn list minus every occurrence of the target
    forward = lists.select(
        F.col("qnode").alias("node"),
        F.array_distinct(F.filter("nn", lambda x: x != tgt)).alias("nbrs"),
    )
    # reverse: 1-NN target -> query-node
    reverse = (
        lists.select(tgt.alias("node"), F.col("qnode").alias("nbr"))
        .groupBy("node")
        .agg(F.array_sort(F.collect_list("nbr")).alias("nbrs"))
    )
    return forward.unionByName(reverse)


def degree_stats(adj: DataFrame, target_degree: int | None = None) -> DataFrame:
    """Degree aggregates over an adjacency table (reference prints these
    after every build, src/index_bipartite.cpp:105-138,1143-1179).

    Returns one row: n_nodes, n_edges, avg/max/min degree and, when
    ``target_degree`` is given, the under-filled node count the reference
    tracks with atomics (we count with a conditional agg — no locks)."""
    deg = adj.select(F.size("nbrs").alias("deg"))
    aggs = [
        F.count("*").alias("n_nodes"),
        F.sum("deg").alias("n_edges"),
        F.round(F.avg("deg"), 6).alias("avg_deg"),
        F.max("deg").alias("max_deg"),
        F.min("deg").alias("min_deg"),
    ]
    if target_degree is not None:
        aggs.append(
            F.sum(F.when(F.col("deg") < target_degree, 1).otherwise(0)).alias("n_under")
        )
    return deg.agg(*aggs)
