"""RoarGraph build + search quality gates (reference methodology §5:
recall against exact ground truth, degree audits, determinism)."""

import pytest
from pyspark.sql import functions as F

from mysteryann_spark.operators.evaluate import mean_recall
from mysteryann_spark.operators.knn import knn_join_arrays
from mysteryann_spark.operators.projection import build_roargraph_from_table
from mysteryann_spark.operators.search import search_graph
from mysteryann_spark.params import IndexParams

PARAMS = IndexParams(M_sq=20, M_pjbp=8, L_pjpq=40, k=10, L_pq=40, metric="l2")


@pytest.fixture(scope="module")
def index(spark, emb):
    adj, ep = build_roargraph_from_table(spark, emb, PARAMS)
    return adj.localCheckpoint(), ep


def test_degree_bounds(index):
    adj, _ = index
    stats = adj.select(F.size("nbrs").alias("deg")).agg(
        F.max("deg").alias("mx"), F.min("deg").alias("mn"), F.count("*").alias("n")
    ).collect()[0]
    assert stats["mx"] <= PARAMS.degree_cap
    assert stats["mn"] >= 1
    assert stats["n"] == 500  # every base node present after connectivity phase


def test_search_recall_meets_gate(spark, emb, index):
    adj, ep = index
    q = emb.select(F.col("vec_id").alias("qid"), "embedding")
    res = search_graph(q, emb, adj, ep, k=10, l_search=PARAMS.L_pq, metric="l2")
    res_arr = (
        res.groupBy("qid")
        .agg(F.array_sort(F.collect_list(F.struct("rank", "nn_id"))).alias("t"))
        .select("qid", F.transform("t", lambda x: x["nn_id"]).alias("nn"))
    )
    gt = knn_join_arrays(q, emb, 10, "l2")
    recall = mean_recall(res_arr, gt, 10)
    assert recall >= 0.95, f"recall@10={recall}"


def test_search_shape_and_counters(spark, emb, index):
    adj, ep = index
    q = emb.where("vec_id < 5").select(F.col("vec_id").alias("qid"), "embedding")
    rows = search_graph(q, emb, adj, ep, k=10, l_search=40, metric="l2").collect()
    assert len(rows) == 50
    for r in rows:
        assert 1 <= r["rank"] <= 10
        assert r["cmps"] > 0 and r["hops"] > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["dist"]))
    for q_rows in by_q.values():
        q_rows.sort()
        dists = [d for _, d in q_rows]
        assert dists == sorted(dists)  # rank order == distance order


def test_build_deterministic(spark, emb, index):
    adj, ep = index
    adj2, ep2 = build_roargraph_from_table(spark, emb, PARAMS)
    assert ep == ep2
    a = {r["node"]: list(r["nbrs"]) for r in adj.collect()}
    b = {r["node"]: list(r["nbrs"]) for r in adj2.collect()}
    assert a == b
