"""Similarity search over embedding columns.

Baseline: exact brute-force top-k (knn_join with metric='cosine' — blocked
GEMM, no base shuffle). Scale path: random-hyperplane LSH bucketing —
signatures are per-row expressions; queries probe only their own bucket
(plus multi-table repeats to recover recall), so per-query work drops from
O(N) to O(N / 2^bits * tables). The RoarGraph index (projection.py +
search.py) is the high-recall scale path; LSH here is the cheap
no-index-build alternative, mirroring how a pipeline would backfill.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysteryann_spark.functions.vector import distance_col
from mysteryann_spark.operators.knn import knn_join


def cosine_topk(
    queries_df: DataFrame, base_df: DataFrame, k: int, exclude_self: bool = True
) -> DataFrame:
    """Exact cosine top-k (the brute-force baseline every ANN variant is
    recall-measured against)."""
    return knn_join(queries_df, base_df, k, "cosine", exclude_self=exclude_self)


def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> list[list[list[float]]]:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(tables, bits, dim)).tolist()


def _bucket_expr(vec_col, planes: list[list[float]]):
    """LSH bucket id: sign-bit concat of <v, plane_j> — pure Catalyst
    (zip_with dot product per plane), no UDF."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    queries_df: DataFrame,
    base_df: DataFrame,
    k: int,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: equi-join query/base on (table, bucket),
    exact re-rank within the candidate set.

    Returns (qid, nn_id, dist, rank) like knn_join; recall vs cosine_topk
    is gated in tests (the driver records rows-only — hyperplane draws are
    seeded numpy, not SQL-expressible).
    """
    dim = len(queries_df.select(vec_col).head()[0])
    planes = _hyperplanes(dim, bits, tables, seed)

    def tagged(df: DataFrame, id_col: str, out_id: str) -> DataFrame:
        per_table = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"), _bucket_expr(F.col(vec_col), planes[t]).alias("bkt")
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"{out_id}_vec"),
            F.explode(per_table).alias("tb"),
        ).select(out_id, f"{out_id}_vec", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))

    q = tagged(queries_df, query_id, "qid")
    b = tagged(base_df, base_id, "nn_id")
    cand = (
        q.join(b, ["tbl", "bkt"])
        .select("qid", "nn_id", "qid_vec", "nn_id_vec")
        .dropDuplicates(["qid", "nn_id"])
    )
    if exclude_self:
        cand = cand.where(F.col("qid") != F.col("nn_id"))
    scored = cand.select(
        "qid", "nn_id", distance_col("cosine", "qid_vec", "nn_id_vec").alias("dist")
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nn_id", "dist", "rank")
    )
