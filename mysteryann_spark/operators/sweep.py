"""Search-quality sweep — the reference's headline evaluation protocol.

``run_roargraph_search_test.sh:1-15`` sweeps L_pq over a list and prints
one CSV row per point: recall@k, QPS, mean latency, avg distance
comparisons, avg hops (columns at tests/test_search_roargraph.cpp:190,
231-236). This operator reproduces that table as a DataFrame: one graph
search per L_pq against the exact-kNN ground truth produced by our own
kNN join (the table the reference downloads as .ibin files).

QPS here is wall-clock over the whole Spark job — at 32 local cores or
1000 executors it measures the BATCH throughput the engine actually
delivers, which is the number that matters for index-build-time search
(the reference's per-thread latency targets online serving, out of scope
per BASELINE.json).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysteryann_spark.operators.evaluate import recall_at_k, relative_distance_error
from mysteryann_spark.operators.knn import knn_join_arrays
from mysteryann_spark.operators.search import search_graph, stage_graph_index
from mysteryann_spark.session import spread


def search_sweep(
    queries_df: DataFrame,
    base_df: DataFrame,
    adj_df: DataFrame,
    entry_point: int,
    k: int,
    l_values: list[int],
    metric: str = "l2",
) -> DataFrame:
    """One row per L_pq: (l_pq, recall, rderr, qps, mean_latency_ms,
    avg_cmps, avg_hops) — the reference's sweep CSV as a DataFrame,
    including its per-point relative-distance-error column
    (ComputeRderr, tests/test_search_roargraph.cpp:38-62,231-232)."""
    spark = base_df.sparkSession
    gt = knn_join_arrays(queries_df, base_df, k, metric).localCheckpoint()
    n_queries = queries_df.count()
    q = spread(queries_df)
    # stage the index once for the whole sweep — every L_pq point reuses
    # the same Parquet artifacts and each worker's cached load
    staged = stage_graph_index(base_df, adj_df)
    rows = []
    for l_pq in l_values:
        t0 = time.time()
        res = search_graph(
            q, base_df, adj_df, entry_point, k=k, l_search=l_pq, metric=metric,
            staged=staged,
        ).localCheckpoint(eager=True)
        wall = time.time() - t0
        res_arr = (
            res.groupBy("qid")
            .agg(
                F.array_sort(F.collect_list(F.struct("rank", "nn_id", "dist"))).alias("t")
            )
            .select(
                "qid",
                F.transform("t", lambda x: x["nn_id"]).alias("nn"),
                F.transform("t", lambda x: x["dist"]).alias("dists"),
            )
        )
        stats = (
            recall_at_k(res_arr, gt, k)
            .agg(F.avg("recall").alias("recall"))
            .crossJoin(
                relative_distance_error(res_arr, gt, k).agg(
                    F.avg("rderr").alias("rderr")
                )
            )
            .crossJoin(
                res.groupBy("qid")
                .agg(F.first("cmps").alias("cmps"), F.first("hops").alias("hops"))
                .agg(F.avg("cmps").alias("avg_cmps"), F.avg("hops").alias("avg_hops"))
            )
            .collect()[0]
        )
        rows.append(
            (
                l_pq,
                round(float(stats["recall"]), 6),
                round(float(stats["rderr"]), 9),
                round(n_queries / wall, 3),
                round(1000.0 * wall / n_queries, 6),
                round(float(stats["avg_cmps"]), 3),
                round(float(stats["avg_hops"]), 3),
            )
        )
    return spark.createDataFrame(
        rows,
        "l_pq int, recall double, rderr double, qps double, "
        "mean_latency_ms double, avg_cmps double, avg_hops double",
    )
