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
from mysteryann_spark.sources.staging import (
    list_staged_files,
    load_staged,
    stage_parquet,
    table_matrix,
)

# Per-worker cap on the transient (query-chunk x arrow-batch) float64
# distance block inside the GEMM kernels. 256 MB x 32 local workers = 8 GB
# of in-flight distance blocks worst case; tune down via env on smaller
# executors. Chunking is exact (per-query results are row-independent).
import os as _os

_DMAT_BUDGET_BYTES = int(
    _os.environ.get("SPARK_GRAFT_DMAT_BUDGET_MB", "256")
) * 1024 * 1024


def dmat_chunk_rows(n_cols: int, itemsize: int = 8) -> int:
    """Rows per chunk so one transient (rows x n_cols) scratch matrix of
    ``itemsize``-byte cells stays under the shared per-worker
    SPARK_GRAFT_DMAT_BUDGET_MB budget. Every bounded GEMM/distance block
    in the package sizes itself through this ONE helper so the budget knob
    means the same thing everywhere (a hand-rolled cell-count floor in the
    centroid-assignment UDF over-allocated 4x the intended bound at the
    256k-centroid 10^8 geometry)."""
    return max(1, int(_DMAT_BUDGET_BYTES // max(1, itemsize * n_cols)))

_CAND_SCHEMA = StructType(
    [
        StructField("qid", LongType(), False),
        StructField("nn_id", LongType(), False),
        StructField("dist", DoubleType(), False),
    ]
)

# (qid, nn_id, dist, rank) — the empty-result shape of knn_join and
# ivf_knn_join. A separate constant, NOT ``_CAND_SCHEMA.add(...)``:
# StructType.add mutates in place and returns self, so building the ranked
# schema at an early-return site would permanently widen _CAND_SCHEMA to 4
# fields and break every later mapInPandas kernel that yields 3 columns.
_RANKED_SCHEMA = StructType(
    list(_CAND_SCHEMA.fields) + [StructField("rank", IntegerType(), False)]
)


def _read_query_block(
    paths: list[str], query_id: str, vec_col: str, match_col: str | None = None
):
    """Executor-side: one query block = one or more staged part files
    (URIs from ``DataFrame.inputFiles``). Returns (qids, qmat[, qmatch])
    or None if the block holds no rows. pyarrow datasets don't
    URI-resolve path *lists*, so the filesystem is resolved explicitly
    (file:/hdfs:/s3:)."""
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    fs, first = pafs.FileSystem.from_uri(paths[0])
    rel = [first] + [pafs.FileSystem.from_uri(p)[1] for p in paths[1:]]
    cols = [query_id, vec_col] + ([match_col] if match_col else [])
    tbl = pq.read_table(rel, filesystem=fs, columns=cols)
    if tbl.num_rows == 0:
        return None
    ids, mat = table_matrix(tbl, query_id, vec_col)
    if match_col is None:
        return ids, mat
    raw_ids = tbl[query_id].combine_chunks().to_numpy(zero_copy_only=False)
    vals = tbl[match_col].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(raw_ids, kind="stable")  # same order as table_matrix
    return ids, mat, vals[order].astype(np.int64)


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
    storage_dir: str | None = None,
    match_col: str | None = None,
) -> DataFrame:
    """Exact top-k join: for each query row, the k nearest base rows.

    Returns ``(qid, nn_id, dist, rank)`` with rank 1..k ordered by
    (dist, nn_id) — the reference's deterministic tiebreak
    (neighbor.h:29-31).

    The query side never round-trips through the driver: it is staged
    once to Parquet by a distributed write (sources/staging.py) and each
    Python worker lazily loads the block it is GEMMing. Default mode
    keeps the whole staged query set resident per worker (the
    reference's own regime — it holds every training query in RAM,
    index.h:61,64; at the flagship 10M x 200-d scale the old
    driver-collect path was a ~16 GB driver round-trip).
    ``query_block_rows`` bounds worker-resident query rows instead: the
    staged write splits into ceil(n_q / block) part files, each GEMMed
    against the (cached) base in its own pass, unioned before the global
    top-k window. Block count trades base rescans for unbounded query
    cardinality.

    ``match_col`` (optional) makes the join FILTERED: both sides must
    carry the column, and a base row only competes for a query's top-k
    when the values match (the Big-ANN filtered-track semantics — e.g.
    same-label retrieval). The filter is a distance mask inside the GEMM
    kernel, so selectivity never costs a second scan.
    """
    spark = base_df.sparkSession
    if match_col is not None:
        # validate up front: the Arrow kernel compares match values as
        # int64, so a string/float label column would die mid-GEMM with an
        # opaque cast error instead of this plan-time message
        from pyspark.sql.types import ByteType, IntegerType, ShortType

        _int_types = (ByteType, ShortType, IntegerType, LongType)
        for side, df in (("queries_df", queries_df), ("base_df", base_df)):
            dt = df.schema[match_col].dataType
            if not isinstance(dt, _int_types):
                raise TypeError(
                    f"knn_join match_col {match_col!r} on {side} must be an "
                    f"integer type (got {dt.simpleString()}); cast labels to "
                    "int/bigint before the join"
                )
    q_cols = [query_id, vec_col] + ([match_col] if match_col else [])
    q_sel = queries_df.select(*q_cols)
    if query_block_rows is None:
        q_path = stage_parquet(q_sel, storage_dir)
    else:
        import math

        n_blocks = max(1, math.ceil(q_sel.count() / query_block_rows))
        q_path = stage_parquet(q_sel.repartition(n_blocks), storage_dir)
    # metadata-only file listing — no query data reaches the driver
    files = list_staged_files(q_path)
    if not files:
        return spark.createDataFrame([], _RANKED_SCHEMA)
    blocks = [files] if query_block_rows is None else [[f] for f in files]

    def block_candidates(block_files: list[str]) -> DataFrame:
        def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            loaded = load_staged(
                "knnq|" + ("m:" + match_col + "|" if match_col else "") + "|".join(block_files),
                lambda: _read_query_block(block_files, query_id, vec_col, match_col),
            )
            if loaded is None:
                return
            if match_col is None:
                b_qids, b_qmat = loaded
                b_qmatch = None
            else:
                b_qids, b_qmat, b_qmatch = loaded
            for pdf in batches:
                if pdf.empty:
                    continue
                bids = pdf[base_id].to_numpy(dtype=np.int64)
                bmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                bm = (
                    pdf[match_col].to_numpy(dtype=np.int64)
                    if b_qmatch is not None
                    else None
                )
                # Bound the worker-resident distance block. An unchunked
                # (n_staged_q x n_batch) float64 matrix scales with the
                # staged-query count: at 60k queries x ~5k-row batches
                # that is ~2.3 GB per in-flight batch, and cores x workers
                # of those OOM-killed the 300k scale rehearsal. Per-query
                # top-k is row-independent, so chunking the query axis is
                # exact — only the transient block size changes.
                q_chunk = dmat_chunk_rows(len(bids))
                for s in range(0, len(b_qids), q_chunk):
                    qids_c = b_qids[s : s + q_chunk]
                    dmat = np_distances(metric, b_qmat[s : s + q_chunk], bmat)
                    if bm is not None:
                        dmat[b_qmatch[s : s + q_chunk, None] != bm[None, :]] = np.inf
                    if exclude_self:
                        # mask before the local top-k, or a batch owning
                        # the query's own row would surrender a slot
                        dmat[qids_c[:, None] == bids[None, :]] = np.inf
                    m = min(k, dmat.shape[1])
                    # local top-m per query: argpartition, exact sort later
                    part = np.argpartition(dmat, m - 1, axis=1)[:, :m]
                    rows_q = np.repeat(np.arange(dmat.shape[0]), m)
                    cand_ids = bids[part.ravel()]
                    cand_d = dmat[rows_q, part.ravel()]
                    yield pd.DataFrame(
                        {"qid": qids_c[rows_q], "nn_id": cand_ids, "dist": cand_d}
                    )

        b_cols = [base_id, vec_col] + ([match_col] if match_col else [])
        return base_df.select(*b_cols).mapInPandas(local_topk, _CAND_SCHEMA)

    candidates = block_candidates(blocks[0])
    for blk in blocks[1:]:
        candidates = candidates.unionByName(block_candidates(blk))
    if exclude_self or match_col is not None:
        candidates = candidates.where(F.col("dist") != float("inf"))
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nn_id").asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nn_id", "dist", "rank")
    )


def flat_to_arrays(flat: DataFrame) -> DataFrame:
    """Collapse ``(qid, nn_id, dist, rank)`` rows into the reference's
    per-query list shape ``(qid, nn ARRAY<BIGINT>, dists ARRAY<DOUBLE>)``
    (LoadLearnBaseKNN, src/index_bipartite.cpp:2622-2639), rank-ordered.
    Shared by the exact kNN join and the IVF-routed approximate one
    (operators/knn_approx.py) so both can feed the graph build phase 1."""
    return flat.groupBy("qid").agg(
        F.array_sort(F.collect_list(F.struct("rank", "nn_id", "dist"))).alias("triples")
    ).select(
        "qid",
        F.transform("triples", lambda t: t["nn_id"]).alias("nn"),
        F.transform("triples", lambda t: t["dist"]).alias("dists"),
    )


def knn_join_arrays(
    queries_df: DataFrame,
    base_df: DataFrame,
    k: int,
    metric: str = "l2",
    **kwargs,
) -> DataFrame:
    """Exact kNN join in the reference's list shape (see flat_to_arrays)."""
    return flat_to_arrays(knn_join(queries_df, base_df, k, metric, **kwargs))


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


def range_join(
    queries_df: DataFrame,
    base_df: DataFrame,
    radius: float,
    metric: str = "l2",
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Range (radius) join: every (query, base) pair with distance
    <= ``radius`` — the fixed-threshold sibling of the top-k kNN join
    (the reference's queue-based search bounds by COUNT, neighbor.h:138;
    a range join bounds by DISTANCE, the retrieval mode used for
    near-duplicate harvesting and recall curves).

    Same scale shape as knn_join: the query side is staged once
    (executor-side Parquet, no driver round-trip), the base side streams
    through one GEMM per Arrow batch, and — unlike top-k — no global
    merge is needed at all: the radius predicate is decided locally per
    batch, so there is ZERO shuffle and output size is the only cost.
    Returns (qid, nn_id, dist).
    """
    spark = base_df.sparkSession
    q_path = stage_parquet(queries_df.select(query_id, vec_col))
    files = list_staged_files(q_path)
    if not files:
        return spark.createDataFrame([], _CAND_SCHEMA)
    r = float(radius)

    def in_range(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        loaded = load_staged(
            "rangeq|" + "|".join(files),
            lambda: _read_query_block(files, query_id, vec_col),
        )
        if loaded is None:
            return
        b_qids, b_qmat = loaded
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf[base_id].to_numpy(dtype=np.int64)
            bmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # same bounded-distance-block regime as knn_join — the radius
            # predicate is per-pair, so query-axis chunking is exact
            q_chunk = dmat_chunk_rows(len(bids))
            for s in range(0, len(b_qids), q_chunk):
                qids_c = b_qids[s : s + q_chunk]
                dmat = np_distances(metric, b_qmat[s : s + q_chunk], bmat)
                if exclude_self:
                    dmat[qids_c[:, None] == bids[None, :]] = np.inf
                qi, bi = np.nonzero(dmat <= r)
                if len(qi) == 0:
                    continue
                yield pd.DataFrame(
                    {"qid": qids_c[qi], "nn_id": bids[bi], "dist": dmat[qi, bi]}
                )

    return base_df.select(base_id, vec_col).mapInPandas(in_range, _CAND_SCHEMA)
