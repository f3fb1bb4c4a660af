"""Search-quality evaluation — SURVEY.md §2.3 J4, §2.4 A3-A5.

Recall@k (ComputeRecall, tests/test_search_roargraph.cpp:23-36): mean over
queries of |result-ids ∩ ground-truth-ids| / k. Relative distance error
(ComputeRderr, :38-62): mean over queries of mean_j |d_res - d_gt| / |d_gt|.

Both are one equi-join on qid + array expressions + a global avg — fully
Catalyst-expressible, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(results: DataFrame, ground_truth: DataFrame, k: int) -> DataFrame:
    """results / ground_truth: ``(qid, nn ARRAY<BIGINT>)`` (rank-ordered).
    Returns per-query recall plus a single aggregate row is left to the
    caller (`.agg(avg)`); per-query keeps it joinable."""
    res = results.select("qid", F.slice("nn", 1, k).alias("res_nn"))
    gt = ground_truth.select("qid", F.slice("nn", 1, k).alias("gt_nn"))
    return res.join(gt, "qid").select(
        "qid",
        (
            F.size(F.array_intersect("res_nn", "gt_nn")).cast("double") / F.lit(float(k))
        ).alias("recall"),
    )


def mean_recall(results: DataFrame, ground_truth: DataFrame, k: int) -> float:
    row = recall_at_k(results, ground_truth, k).agg(F.avg("recall").alias("r")).collect()[0]
    return float(row["r"])


def relative_distance_error(results: DataFrame, ground_truth: DataFrame, k: int) -> DataFrame:
    """Per-query mean relative distance error vs exact distances.

    Uses |gt| in the denominator so the negated-IP convention (negative
    distances) stays well-defined — the reference applies metric-specific
    sign fixes for the same reason (tests/test_search_roargraph.cpp:44-57).
    """
    res = results.select("qid", F.slice("dists", 1, k).alias("res_d"))
    gt = ground_truth.select("qid", F.slice("dists", 1, k).alias("gt_d"))
    # |res - gt| below 1e-9 is float noise (inputs are float32; a GEMM-
    # identity distance can render an exact 0 as ~2e-16, which the 1e-12
    # denominator floor would inflate to 2e-4) — clamp it to a true zero.
    err = F.zip_with(
        "res_d",
        "gt_d",
        lambda a, b: F.when(F.abs(a - b) < 1e-9, F.lit(0.0)).otherwise(
            F.abs(a - b) / F.greatest(F.abs(b), F.lit(1e-12))
        ),
    )
    return res.join(gt, "qid").select(
        "qid",
        (F.aggregate(err, F.lit(0.0), lambda s, v: s + v) / F.size("res_d").cast("double")).alias("rderr"),
    )
