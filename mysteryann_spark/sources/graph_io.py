"""Graph-index persistence.

The reference sinks adjacency as a custom binary stream — per-node
``(deg:uint32, nbrs[deg])`` with an ``(ep, npts)`` header for the projection
graph (src/index_bipartite.cpp:2045-2071 Save/Load, :2606-2619
SaveProjectionGraph). Spark-side the index is two Parquet artifacts:

- ``adjacency/``  — rows ``(node BIGINT, nbrs ARRAY<BIGINT>)``
- ``meta/``       — a single-row table carrying the scalar header
                    (entry point, metric, dim, build params)

Parquet keeps the artifact splittable (a 10-billion-node adjacency reads
back as a partitioned scan) and self-describing, which the raw stream isn't.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession

from mysteryann_spark.params import IndexParams


def save_adjacency(adj: DataFrame, path: str) -> None:
    """Sink ``(node, nbrs)`` adjacency (reference Save, src/index_bipartite.cpp:2045)."""
    adj.select("node", "nbrs").write.mode("overwrite").parquet(os.path.join(path, "adjacency"))


def load_adjacency(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "adjacency"))


def save_index(
    adj: DataFrame,
    path: str,
    *,
    entry_point: int,
    dim: int,
    params: IndexParams,
) -> None:
    """Sink the projection graph + metadata header.

    Mirrors SaveProjectionGraph's ``(ep, npts)`` header
    (src/index_bipartite.cpp:2606-2619) with the extra fields a reader needs
    to search without out-of-band knowledge.
    """
    save_adjacency(adj, path)
    spark = adj.sparkSession
    meta = spark.createDataFrame(
        [
            Row(
                entry_point=int(entry_point),
                metric=params.metric,
                dim=int(dim),
                m_sq=params.M_sq,
                m_pjbp=params.M_pjbp,
                l_pjpq=params.L_pjpq,
                seed=params.seed,
            )
        ]
    )
    meta.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def load_index(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Load (adjacency DataFrame, metadata dict) — reference LoadProjectionGraph
    (src/index_bipartite.cpp:2097-2117)."""
    adj = load_adjacency(spark, path)
    meta = spark.read.parquet(os.path.join(path, "meta")).head().asDict()
    return adj, meta
