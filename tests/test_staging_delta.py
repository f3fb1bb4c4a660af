"""Delta-staged adjacency: `read_staged_multi` later-paths-override
semantics, and bit-parity of `search_graph` through a [full, delta]
staged adjacency vs the equivalently merged single staging — the
read-side half of per-batch maintenance staging cost ∝ |batch|
(SCALE.md names the O(|graph|) per-batch republish as the measured
floor of insert walls at 10^7)."""

import pytest
from pyspark.sql import functions as F

from mysteryann_spark.operators.projection import build_roargraph_from_table
from mysteryann_spark.operators.search import search_graph, stage_graph_index
from mysteryann_spark.params import IndexParams
from mysteryann_spark.sources.staging import read_staged_multi, stage_parquet

PARAMS = IndexParams(M_sq=20, M_pjbp=8, L_pjpq=40, k=10, L_pq=40, metric="l2")


def _adj_df(spark, rows):
    return spark.createDataFrame(rows, "node bigint, nbrs array<bigint>")


def test_read_staged_multi_override(spark):
    full = _adj_df(spark, [(0, [1, 2]), (1, [0]), (2, [0, 1]), (3, [2])])
    delta = _adj_df(spark, [(1, [2, 3]), (4, [0])])
    paths = [stage_parquet(full), stage_parquet(delta)]
    tbl = read_staged_multi(paths)
    got = {
        int(n): list(map(int, nb))
        for n, nb in zip(tbl["node"].to_pylist(), tbl["nbrs"].to_pylist())
    }
    assert got == {0: [1, 2], 1: [2, 3], 2: [0, 1], 3: [2], 4: [0]}


def test_read_staged_multi_single_path_identity(spark):
    full = _adj_df(spark, [(0, [1]), (1, [0])])
    p = stage_parquet(full)
    assert read_staged_multi([p]).equals(read_staged_multi(p))


def test_read_staged_multi_last_path_wins_across_three(spark):
    a = _adj_df(spark, [(0, [1]), (1, [0])])
    b = _adj_df(spark, [(0, [2])])
    c = _adj_df(spark, [(0, [3]), (2, [0])])
    tbl = read_staged_multi([stage_parquet(a), stage_parquet(b), stage_parquet(c)])
    got = {
        int(n): list(map(int, nb))
        for n, nb in zip(tbl["node"].to_pylist(), tbl["nbrs"].to_pylist())
    }
    assert got == {0: [3], 1: [0], 2: [0]}


@pytest.fixture(scope="module")
def built(spark, emb):
    adj, ep = build_roargraph_from_table(spark, emb, PARAMS)
    return adj.localCheckpoint(), ep


def test_search_parity_delta_vs_merged_adjacency(spark, emb, built):
    """Mutate 20 nodes' lists, search through (a) the merged adjacency
    staged whole and (b) [original, delta-of-changed-rows] — results
    must be bit-identical (same ids, dists, ranks, counters)."""
    adj, ep = built
    changed = adj.where(F.col("node") < 20).select(
        "node", F.expr("slice(nbrs, 1, greatest(1, size(nbrs) - 2))").alias("nbrs")
    ).localCheckpoint()
    merged = adj.where(F.col("node") >= 20).unionByName(changed).localCheckpoint()

    q = emb.where("vec_id % 25 = 0").select(F.col("vec_id").alias("qid"), "embedding")
    base_path, adj_full_path = stage_graph_index(emb, adj)
    merged_path = stage_parquet(merged)
    delta_path = stage_parquet(changed)

    res_merged = search_graph(
        q, emb, merged, ep, k=10, l_search=PARAMS.L_pq, metric="l2",
        staged=(base_path, merged_path),
    ).collect()
    res_delta = search_graph(
        q, emb, merged, ep, k=10, l_search=PARAMS.L_pq, metric="l2",
        staged=(base_path, [adj_full_path, delta_path]),
    ).collect()

    key = lambda r: (r["qid"], r["rank"])  # noqa: E731
    a = sorted(((r["qid"], r["rank"], r["nn_id"], r["dist"], r["cmps"], r["hops"])
                for r in res_merged))
    b = sorted(((r["qid"], r["rank"], r["nn_id"], r["dist"], r["cmps"], r["hops"])
                for r in res_delta))
    assert a == b and len(a) > 0


def test_insert_delta_stages_like_merged(spark, emb, built):
    """The maintenance fast path end-to-end: insert a batch with
    return_delta=True, stage ONLY the delta, and search through
    [pre-insert adjacency, delta] — bit-identical to searching the
    merged adjacency staged whole, and the delta row set is exactly
    the new nodes plus the reverse-touched nodes."""
    from mysteryann_spark.operators.projection import insert_into_roargraph

    adj, ep = built
    new = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    ).where("vec_id < 100030")
    merged, ep2, delta = insert_into_roargraph(
        emb, adj, ep, new, PARAMS, return_delta=True)
    merged = merged.localCheckpoint()
    delta = delta.localCheckpoint()

    delta_nodes = {r["node"] for r in delta.select("node").collect()}
    assert {r["vec_id"] for r in new.select("vec_id").collect()} <= delta_nodes
    # delta ∪ untouched == merged, with delta overriding
    assert merged.count() == adj.count() + 30
    assert delta.count() == len(delta_nodes)

    all_vec = emb.select("vec_id", "embedding").unionByName(new)
    base_path, adj_full_path = stage_graph_index(all_vec, adj)
    q = all_vec.where("vec_id % 40 = 0").select(
        F.col("vec_id").alias("qid"), "embedding")
    res_m = search_graph(
        q, all_vec, merged, ep2, k=10, l_search=PARAMS.L_pq, metric="l2",
        staged=(base_path, stage_parquet(merged)),
    ).collect()
    res_d = search_graph(
        q, all_vec, merged, ep2, k=10, l_search=PARAMS.L_pq, metric="l2",
        staged=(base_path, [adj_full_path, stage_parquet(delta)]),
    ).collect()
    a = sorted(((r["qid"], r["rank"], r["nn_id"], r["dist"], r["cmps"], r["hops"])
                for r in res_m))
    b = sorted(((r["qid"], r["rank"], r["nn_id"], r["dist"], r["cmps"], r["hops"])
                for r in res_d))
    assert a == b and len(a) > 0
