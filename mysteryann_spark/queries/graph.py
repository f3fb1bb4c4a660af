"""RoarGraph build + search registry entries — SURVEY.md §2.9 G4, §2.10 Q1.

These are the genuinely non-SQL-expressible operators (iterative occlusion
pruning, best-first graph traversal): no ``oracle_sql`` entry, so the
driver records the weaker rows-only check. Their quality gates live in
``tests/test_graph.py`` instead, mirroring the reference's own methodology
(recall against exact ground truth — tests/test_search_roargraph.cpp:23-36):
recall@10 >= 0.95 at the registered build parameters, degree caps
respected, deterministic across rebuilds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysteryann_spark.operators.projection import build_roargraph_from_table
from mysteryann_spark.operators.search import search_graph
from mysteryann_spark.params import IndexParams
from mysteryann_spark.queries.base import QuerySpec
from mysteryann_spark.sources.tables import load_table

# Registered build config (scaled-down run_roargraph_test.sh:5-10 shape).
PARAMS = IndexParams(M_sq=20, M_pjbp=8, L_pjpq=40, k=10, L_pq=40, metric="l2")
# The reference's flagship run is dist=ip (run_roargraph_test.sh:7) — the
# same knobs under negated inner product.
PARAMS_IP = IndexParams(M_sq=20, M_pjbp=8, L_pjpq=40, k=10, L_pq=40, metric="ip")
_N_SEARCH_QUERIES = 50


_BUILD_CACHE: dict = {}


def _build(spark: SparkSession, sf_dir: str, params: IndexParams = PARAMS):
    """Build once per (session, sf_dir, metric): the registry entries
    share the same index, and the driver's correctness gate runs them all
    in one session — rebuilding an identical (deterministic, tested)
    graph per query would quadruple gate time for no information."""
    key = (id(spark.sparkContext), sf_dir, params.metric)
    if key not in _BUILD_CACHE:
        emb = load_table(spark, "embeddings", sf_dir).cache()
        adj, ep = build_roargraph_from_table(spark, emb, params)
        _BUILD_CACHE[key] = (emb, adj.localCheckpoint(), ep)
    return _BUILD_CACHE[key]


def roargraph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree of the built projection graph (the reference's
    post-build degree audit, src/index_bipartite.cpp:1143-1179)."""
    _, adj, _ = _build(spark, sf_dir)
    return adj.select("node", F.size("nbrs").cast("bigint").alias("degree"))


def roargraph_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k beam-search results for the query slice (qid < 50)."""
    emb, adj, ep = _build(spark, sf_dir)
    q = emb.where(F.col("vec_id") < _N_SEARCH_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    res = search_graph(
        q, emb, adj.localCheckpoint(), ep,
        k=PARAMS.k, l_search=PARAMS.L_pq, metric=PARAMS.metric,
    )
    return res.select("qid", "nn_id", F.round("dist", 6).alias("dist"), "rank", "cmps", "hops")


def roargraph_search_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k search over a graph BUILT AND SEARCHED under negated inner
    product — the reference's flagship configuration (dist=ip,
    run_roargraph_test.sh:7). Rows-only; the recall gate for this metric
    lives in tests/test_graph.py (test_build_and_search_ip_metric)."""
    emb, adj, ep = _build(spark, sf_dir, PARAMS_IP)
    q = emb.where(F.col("vec_id") < _N_SEARCH_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    res = search_graph(
        q, emb, adj.localCheckpoint(), ep,
        k=PARAMS_IP.k, l_search=PARAMS_IP.L_pq, metric=PARAMS_IP.metric,
    )
    return res.select("qid", "nn_id", F.round("dist", 6).alias("dist"), "rank", "cmps", "hops")


def roargraph_search_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier-join (Pregel-style) rendering of the beam search — the
    scale path for indexes beyond executor memory. Bit-identical to the
    broadcast path (tests/test_graph.py parity test); registered on a
    small query slice because each best-first hop is a join round."""
    from mysteryann_spark.operators.search_distributed import search_graph_distributed

    emb, adj, ep = _build(spark, sf_dir)
    # small slice + beam: every best-first hop is a driver-synchronized
    # join round, so this entry demonstrates the operator; the bit-parity
    # vs the broadcast path is gated in tests/test_graph.py
    q = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("qid"), "embedding")
    res = search_graph_distributed(
        q, emb, adj.localCheckpoint(), ep, k=5, l_search=6, metric=PARAMS.metric
    )
    return res.select("qid", "nn_id", F.round("dist", 6).alias("dist"), "rank", "cmps", "hops")


def bipartite_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: 2-hop beam search over the bipartite graph with 10 seeded
    random entry points (SearchBipartiteGraph,
    src/index_bipartite.cpp:282-356; the reference's random_device seeds
    made deterministic)."""
    from mysteryann_spark.operators.bipartite import build_bipartite
    from mysteryann_spark.operators.knn import knn_join_arrays
    from mysteryann_spark.operators.search import search_bipartite

    emb = load_table(spark, "embeddings", sf_dir)
    base_count = emb.count()
    q_all = emb.select(F.col("vec_id").alias("qid"), "embedding")
    knn = knn_join_arrays(q_all, emb, PARAMS.M_sq, PARAMS.metric)
    adj = build_bipartite(knn, m=PARAMS.M_sq, base_count=base_count).localCheckpoint()
    q = emb.where(F.col("vec_id") < _N_SEARCH_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    res = search_bipartite(
        q, emb, adj, base_count=base_count,
        k=PARAMS.k, l_search=PARAMS.L_pq, metric=PARAMS.metric,
    )
    return res.select("qid", "nn_id", F.round("dist", 6).alias("dist"), "rank", "cmps", "hops")


def roargraph_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline evaluation (run_roargraph_search_test.sh):
    recall@k / QPS / latency / avg cmps / avg hops per L_pq sweep point.
    The reference protocol sweeps a dense L list from k up to several
    hundred (run_roargraph_search_test.sh:1-15, 57 values 10..2000);
    registered here are 22 points spanning k..300 at the scaled-down
    build — the staged index is shared across points, so each extra
    point costs one search pass only. Rows-only (timings aren't SQL);
    recall monotonicity + floor gated in tests."""
    from mysteryann_spark.operators.sweep import search_sweep

    emb, adj, ep = _build(spark, sf_dir)
    q = emb.where(F.col("vec_id") < _N_SEARCH_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return search_sweep(q, emb, adj, ep, k=PARAMS.k,
                        l_values=[10, 12, 15, 18, 20, 25, 30, 35, 40, 50, 60,
                                  70, 80, 90, 100, 120, 140, 160, 200, 240,
                                  270, 300],
                        metric=PARAMS.metric)


def roargraph_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered graph ANN (Big-ANN filtered-track shape): same-label
    top-k by over-retrieval + post-filter — search the unfiltered graph
    with k and L widened by the label selectivity (10 labels -> 10x),
    keep matching-label hits, re-rank to k. The standard post-filter
    strategy when the index is label-agnostic; recall vs the exact
    filtered kNN is gated in tests/test_graph.py."""
    from pyspark.sql import Window

    emb, adj, ep = _build(spark, sf_dir)
    q = emb.where(F.col("vec_id") < _N_SEARCH_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding", "label"
    )
    # 10 labels -> 10x expected selectivity, widened another 1.5x for
    # per-query variance (a label's k-th neighbor can rank well past
    # k*selectivity globally — the documented post-filter decay that
    # motivates filtered indexes at production scale)
    wide_k = PARAMS.k * 15
    wide_l = wide_k * 2
    res = search_graph(
        q.select("qid", "embedding"), emb, adj.localCheckpoint(), ep,
        k=wide_k, l_search=wide_l, metric=PARAMS.metric, exclude_self=True,
    )
    labeled = (
        res.join(emb.select(F.col("vec_id").alias("nn_id"), F.col("label").alias("nn_label")), "nn_id")
        .join(q.select("qid", F.col("label").alias("q_label")), "qid")
        .where(F.col("nn_label") == F.col("q_label"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nn_id").asc())
    return (
        labeled.withColumn("frank", F.row_number().over(w))
        .where(F.col("frank") <= PARAMS.k)
        .select("qid", "nn_id", F.round("dist", 6).alias("dist"), F.col("frank").alias("rank"))
    )


def roargraph_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance: build on the first 90% of the base,
    insert the held-out 10% as a batch (search -> prune -> reverse-link,
    operators/projection.insert_into_roargraph), return per-node degrees
    of the merged graph. Rows-only; recall/degree-cap/determinism gates
    live in tests/test_graph.py."""
    from mysteryann_spark.operators.projection import (
        build_roargraph_from_table,
        insert_into_roargraph,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cut = int(emb.count() * 0.9)
    old = emb.where(F.col("vec_id") < cut)
    new = emb.where(F.col("vec_id") >= cut)
    adj, ep = build_roargraph_from_table(spark, old, PARAMS)
    merged, _ = insert_into_roargraph(
        old.select("vec_id", "embedding"), adj.localCheckpoint(), ep,
        new.select("vec_id", "embedding"), PARAMS,
    )
    return merged.select("node", F.size("nbrs").cast("bigint").alias("degree"))


def roargraph_save_load_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index persistence round-trip under the driver's eye: save the
    built projection graph + metadata header (SaveProjectionGraph,
    src/index_bipartite.cpp:2606-2619), load it back (LoadProjectionGraph,
    :2097-2117), and search THROUGH the loaded copy — results must equal
    searching the in-session graph (rows-only here; byte-level save/load
    equality is test-gated in tests/test_graph.py)."""
    import tempfile

    from mysteryann_spark.sources.graph_io import load_index, save_index

    emb, adj, ep = _build(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="mysteryann-roundtrip-")
    dim = len(emb.select("embedding").head()[0])
    save_index(adj, path, entry_point=ep, dim=dim, params=PARAMS)
    adj2, meta = load_index(spark, path)
    q = emb.where(F.col("vec_id") < 20).select(F.col("vec_id").alias("qid"), "embedding")
    res = search_graph(
        q, emb, adj2.localCheckpoint(), int(meta["entry_point"]),
        k=PARAMS.k, l_search=PARAMS.L_pq, metric=str(meta["metric"]),
    )
    return res.select("qid", "nn_id", F.round("dist", 6).alias("dist"), "rank")


QUERIES: dict[str, QuerySpec] = {
    "roargraph_sweep": QuerySpec(roargraph_sweep, None),
    "roargraph_degrees": QuerySpec(roargraph_degrees, None),
    "roargraph_search_topk": QuerySpec(roargraph_search_topk, None),
    "roargraph_search_ip": QuerySpec(roargraph_search_ip, None),
    "roargraph_search_distributed": QuerySpec(roargraph_search_distributed, None),
    "bipartite_search_topk": QuerySpec(bipartite_search_topk, None),
    "roargraph_search_filtered": QuerySpec(roargraph_search_filtered, None),
    "roargraph_insert": QuerySpec(roargraph_insert, None),
    "roargraph_save_load_search": QuerySpec(roargraph_save_load_search, None),
}
