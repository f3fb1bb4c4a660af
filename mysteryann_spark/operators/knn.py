"""Exact kNN join + medoid — SURVEY.md §2.3 J1 and §2.4 A1.

The reference never computes exact kNN itself: it downloads precomputed
query→base ground-truth tables and loads them as build input
(``LoadLearnBaseKNN``, src/index_bipartite.cpp:2622-2639; fetch
prepare_data.sh:29). In a self-contained engine that table is produced by a
blocked brute-force kNN join, which doubles as the ground-truth generator
for recall evaluation — the same computation the reference's GT files
represent.

Scale shape (100 TB): the *training-query* side is the sampled/small side
(the reference holds all of it in RAM on one node too — index.h:61,64), so
it is broadcast once per executor; the base side streams through
``mapInPandas`` in Arrow batches, each batch doing one float64 GEMM
(np_distances — the vectorized replacement for the AVX kernels in
distance.h:22-226) and keeping only its local top-k. The global merge then
handles partitions × n_q × k candidate rows — independent of base
cardinality — with a per-qid window. No base-side shuffle at all: the only
shuffle is the final (qid)-partitioned top-k over the already-tiny
candidate set.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from mysteryann_spark.functions.vector import l2_sq, np_distances

_CAND_SCHEMA = StructType(
    [
        StructField("qid", LongType(), False),
        StructField("nn_id", LongType(), False),
        StructField("dist", DoubleType(), False),
    ]
)


def knn_join(
    queries_df: DataFrame,
    base_df: DataFrame,
    k: int,
    metric: str = "l2",
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    query_block_rows: int | None = None,
) -> DataFrame:
    """Exact top-k join: for each query row, the k nearest base rows.

    Returns ``(qid, nn_id, dist, rank)`` with rank 1..k ordered by
    (dist, nn_id) — the reference's deterministic tiebreak
    (neighbor.h:29-31).

    Default mode broadcasts the whole query side at once (the reference's
    own regime — it holds every training query in RAM, index.h:61,64).
    ``query_block_rows`` switches to blocked mode: query blocks stream
    through ``toLocalIterator`` (driver holds ONE block), each block is
    broadcast and GEMMed against the (cached) base in its own pass, and
    the per-block candidates union before the global top-k window. Block
    count trades base rescans for unbounded query cardinality.
    """
    spark = base_df.sparkSession

    def block_candidates(q_rows: list) -> DataFrame:
        qids = np.array([r[0] for r in q_rows], dtype=np.int64)
        qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
        bc = spark.sparkContext.broadcast((qids, qmat))

        def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            b_qids, b_qmat = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                bids = pdf[base_id].to_numpy(dtype=np.int64)
                bmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                dmat = np_distances(metric, b_qmat, bmat)  # (n_q, n_batch)
                if exclude_self:
                    # mask before the local top-k, or a batch owning the
                    # query's own row would surrender a candidate slot
                    dmat[b_qids[:, None] == bids[None, :]] = np.inf
                m = min(k, dmat.shape[1])
                # local top-m per query: argpartition, exact sort later
                part = np.argpartition(dmat, m - 1, axis=1)[:, :m]
                rows_q = np.repeat(np.arange(dmat.shape[0]), m)
                cand_ids = bids[part.ravel()]
                cand_d = dmat[rows_q, part.ravel()]
                yield pd.DataFrame(
                    {"qid": b_qids[rows_q], "nn_id": cand_ids, "dist": cand_d}
                )

        return base_df.select(base_id, vec_col).mapInPandas(local_topk, _CAND_SCHEMA)

    if query_block_rows is None:
        q_rows = queries_df.select(query_id, vec_col).collect()
        blocks = [q_rows] if q_rows else []
    else:
        blocks = []
        buf: list = []
        for row in queries_df.select(query_id, vec_col).toLocalIterator():
            buf.append(row)
            if len(buf) >= query_block_rows:
                blocks.append(buf)
                buf = []
        if buf:
            blocks.append(buf)
    if not blocks:
        return spark.createDataFrame([], _CAND_SCHEMA.add(StructField("rank", IntegerType())))

    candidates = block_candidates(blocks[0])
    for blk in blocks[1:]:
        candidates = candidates.unionByName(block_candidates(blk))
    if exclude_self:
        candidates = candidates.where(F.col("dist") != float("inf"))
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nn_id").asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nn_id", "dist", "rank")
    )


def knn_join_arrays(
    queries_df: DataFrame,
    base_df: DataFrame,
    k: int,
    metric: str = "l2",
    **kwargs,
) -> DataFrame:
    """kNN join in the reference's list shape: ``(qid, nn ARRAY<BIGINT>,
    dists ARRAY<DOUBLE>)`` — what LoadLearnBaseKNN consumed per query
    (src/index_bipartite.cpp:2622-2639), rank-ordered."""
    flat = knn_join(queries_df, base_df, k, metric, **kwargs)
    return flat.groupBy("qid").agg(
        F.array_sort(F.collect_list(F.struct("rank", "nn_id", "dist"))).alias("triples")
    ).select(
        "qid",
        F.transform("triples", lambda t: t["nn_id"]).alias("nn"),
        F.transform("triples", lambda t: t["dist"]).alias("dists"),
    )


def medoid(
    base_df: DataFrame,
    base_id: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[int, float]:
    """Centroid-then-medoid entry point (CalculateProjectionep,
    src/index_bipartite.cpp:2004-2041): mean of all vectors, then the base
    point closest to that mean (squared L2, (dist, id) tiebreak).

    Partial/final aggregation: per-dimension means via posexplode+avg (one
    map-side-combined shuffle of 64·n_partitions partial sums, not data),
    centroid collected (64 doubles — a scalar-sized aggregate), then a
    single scan computes distance-to-centroid and TakeOrdered(1) picks the
    medoid. Two scans total, no full shuffle of vectors.
    """
    cent_rows = (
        base_df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    centroid = [r["m"] for r in sorted(cent_rows, key=lambda r: r["pos"])]
    cent_lit = F.array(*[F.lit(float(v)) for v in centroid])
    best = (
        base_df.select(
            F.col(base_id).alias("medoid_id"),
            l2_sq(F.col(vec_col), cent_lit).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col("medoid_id").asc())
        .limit(1)
        .collect()[0]
    )
    return int(best["medoid_id"]), float(best["dist"])
