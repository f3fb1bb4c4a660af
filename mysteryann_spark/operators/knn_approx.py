"""IVF-routed approximate kNN join — the sub-quadratic phase 0 for the
graph build.

The exact training-kNN (operators/knn.py J1) is the build's only
super-linear stage: every query GEMMs against every base row, and the
600k scale rehearsal measured the resulting wall growing between linear
and quadratic. The reference never pays this cost in-line — at its 10M
flagship scale it downloads PRECOMPUTED ground truth and loads it as
build input (``LoadLearnBaseKNN``, src/index_bipartite.cpp:2622-2639;
fetched by prepare_data.sh:29). A self-contained engine needs the
equivalent shortcut: an approximate kNN whose per-query cost is a
FRACTION of the base, feeding the same ``(qid, nn[], dists[])`` table.

Shape (designed for the 100 TB regime):

- coarse centroids: seeded k-means on a bounded hash-sample (the FAISS
  IVF training protocol, same as operators/similarity.py) — the model is
  kilobytes, broadcast once.
- base side: one shuffle on centroid id (the same partitioning the
  persisted IVF index uses — at scale this shuffle IS the index build and
  is amortized by persisting it), then streamed through ``mapInPandas``.
- query side: staged once to Parquet (sources/staging.py — no driver
  round-trip) and loaded per worker; each worker computes every query's
  ``n_probe`` nearest centroids locally from the broadcast model (one
  (n_q x n_centroids) GEMM, cached with the staged matrix).
- kernel: per Arrow batch of base rows, group by centroid id and GEMM
  each centroid's rows against ONLY the queries probing that centroid —
  total work = sum over lists (probers x list length), i.e.
  ~(n_probe / n_centroids) of the exact join's flops. The full-distance
  masked form (knn_join's match_col) would compute the whole matrix and
  throw most of it away; this kernel never materializes skipped pairs.
- global merge: the same tiny (qid)-window top-k as the exact join.

Routing: base rows are assigned to their L2-nearest centroid in routing
space (raw vectors; L2-normalized first for metric=cosine — spherical
k-means). Queries probe centroids under the SEARCH metric, so ip queries
chase high-dot centroids (the FAISS MIPS-IVF convention). Approximation
is recall-gated in tests/test_knn_approx.py and at build level by the
phase-0 swap gate in tests/test_graph.py.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType
from mysteryann_spark.functions.vector import np_distances, np_normalize
from mysteryann_spark.operators.knn import (
    _CAND_SCHEMA,
    _DMAT_BUDGET_BYTES,
    _RANKED_SCHEMA,
)
from mysteryann_spark.sources.staging import (
    list_staged_files,
    load_staged,
    stage_parquet,
    table_matrix,
)


def train_routing_centroids(
    base_df: DataFrame,
    n_centroids: int,
    metric: str,
    max_iter: int = 5,
    seed: int = 42,
    train_sample: int | None = None,
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    hierarchical: bool | None = None,
    branch: int | None = None,
    n_base: int | None = None,
    dim: int | None = None,
) -> tuple[np.ndarray, tuple[np.ndarray, np.ndarray] | None]:
    """Seeded k-means centroids over a bounded deterministic hash-sample,
    in ROUTING space: raw vectors for l2/ip, L2-normalized for cosine
    (spherical k-means). Same sampling protocol as
    similarity.train_centroids; the sample cap defaults to ~256 points
    per centroid — past that k-means stops moving.

    Returns ``(cmat, route | None)``. Above ``_FLAT_KMEANS_MAX``
    centroids (override with ``hierarchical``) training runs the same
    two-level Lloyd the IVF-PQ builder uses (``_hierarchical_kmeans``)
    and returns the ``(l1_float32, indptr)`` routing structure, so the
    graph build's phase-0 assignment pays O(branch + R*k/branch) per row
    instead of rediscovering the measured ~2.4 h flat-assignment wall at
    the 163,840-list 10^8 geometry (SCALE.md r11)."""
    from mysteryann_spark.operators.similarity import (
        _FLAT_KMEANS_MAX,
        _guard_train_collect,
        _hierarchical_kmeans,
        _parse_size_bytes,
        _sample_kmeans,
        hash_sample_vectors,
    )

    if train_sample is None:
        train_sample = max(4096, 256 * n_centroids)
    if n_base is None:
        # callers that already counted the base pass it in — at 10^8
        # rows this duplicate count() was a full extra pass per build
        n_base = base_df.count()
    rate = max(1, int(np.ceil(n_base / float(train_sample))))
    if dim is None:
        # no dim witness threaded in: one head() job remains
        head = base_df.select(vec_col).head()
        dim = len(head[0]) if head is not None and head[0] is not None else 0
    _guard_train_collect(
        -(-n_base // rate),
        dim,
        _parse_size_bytes(
            base_df.sparkSession.conf.get("spark.driver.maxResultSize", "1g") or "0"
        ),
    )
    sample = hash_sample_vectors(base_df, base_id, vec_col, rate)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in sample])
    if metric == "cosine":
        mat = np_normalize(mat)
    if hierarchical is None:
        hierarchical = n_centroids > _FLAT_KMEANS_MAX
    if hierarchical:
        cmat, l1, indptr = _hierarchical_kmeans(
            mat, n_centroids, max_iter, seed, branch=branch
        )
        return cmat, (np.ascontiguousarray(l1, dtype=np.float32), indptr)
    return _sample_kmeans(mat, n_centroids, max_iter, seed), None


def _route(metric: str, mat: np.ndarray) -> np.ndarray:
    return np_normalize(mat) if metric == "cosine" else mat


def ivf_knn_join(
    queries_df: DataFrame,
    base_df: DataFrame,
    k: int,
    metric: str = "l2",
    n_centroids: int | None = None,
    n_probe: int = 8,
    max_iter: int = 5,
    seed: int = 42,
    train_sample: int | None = None,
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    storage_dir: str | None = None,
    hierarchical: bool | None = None,
    branch: int | None = None,
) -> DataFrame:
    """Approximate top-k join, same contract as knn_join —
    ``(qid, nn_id, dist, rank)``, rank 1..k ordered by (dist, nn_id) —
    but each query scores only the inverted lists of its ``n_probe``
    nearest centroids: ~(n_probe / n_centroids) of the exact flops.

    ``n_centroids`` defaults to ~sqrt(n_base) (balanced list length vs
    probe cost, the standard IVF sizing); queries whose true neighbors
    straddle a list boundary miss them — recall is tuned by ``n_probe``
    and gated in tests, exactly how the reference gates its own
    approximate search quality.

    Above ``_FLAT_KMEANS_MAX`` centroids (``hierarchical`` overrides)
    training and base assignment go through the two-level route — the
    same O(branch + R*k/branch) structure the IVF-PQ builder uses, so a
    10^8-order build never pays the flat O(k)-per-row assignment wall.
    Query PROBING also routes for metric=l2 (``_routed_nearest`` is an
    L2 scorer); cosine/ip probing keeps the exact chunked GEMM — their
    centroid ranking depends on centroid norms / dot products the
    two-level L2 route does not order by.
    """
    spark = base_df.sparkSession
    # count + dim witness in ONE aggregate job (the trainer's separate
    # head() was one more driver job + gap per build)
    stat = base_df.agg(
        F.count(F.lit(1)).alias("n"), F.first(vec_col).alias("v")
    ).head()
    n_base = int(stat["n"])
    dim = len(stat["v"]) if stat is not None and stat["v"] is not None else 0
    if n_base == 0:
        return spark.createDataFrame([], _RANKED_SCHEMA)
    if n_centroids is None:
        n_centroids = max(4, min(4096, int(math.isqrt(n_base))))
    n_probe = min(n_probe, n_centroids)

    cmat, route = train_routing_centroids(
        base_df,
        n_centroids,
        metric,
        max_iter,
        seed,
        train_sample,
        base_id,
        vec_col,
        hierarchical=hierarchical,
        branch=branch,
        n_base=n_base,
        dim=dim,
    )
    bc_cent = spark.sparkContext.broadcast(cmat)
    bc_route = spark.sparkContext.broadcast(route) if route is not None else None
    npr = min(n_probe, len(cmat))

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    # executor-side memo: float32 recast of the broadcast centroid matrix,
    # built once per python worker, not per Arrow batch (similarity.py's
    # `_cent32` convention)
    _f32_slot: list = []

    def _cent32() -> np.ndarray:
        if not _f32_slot:
            _f32_slot.append(np.ascontiguousarray(bc_cent.value, dtype=np.float32))
        return _f32_slot[0]

    @pandas_udf(ArrayType(IntegerType()))
    def probe_cids(vecs: pd.Series) -> pd.Series:
        """Per-query n_probe nearest centroids under the SEARCH metric.
        Computed as a DISTRIBUTED stage and persisted with the staged
        query set: the previous design ran this GEMM inside the
        executor-side artifact build, i.e. single-threaded in ONE worker
        per host — a serial wall that grows with the training set
        (~4e12 flops at the 10^7 full-training scale, tens of minutes
        while every other core idles). Row-independent math (the GEMM
        identity and per-row argpartition), so batching does not change
        any query's probe set."""
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = _route(metric, np.stack([np.asarray(v, dtype=np.float64) for v in vecs]))
        if bc_route is not None and metric == "l2":
            from mysteryann_spark.operators.similarity import _routed_nearest

            l1_32, indptr = bc_route.value
            p = _routed_nearest(m, _cent32(), l1_32, indptr, npr)
            return pd.Series(list(p))
        d = np_distances(metric, m, bc_cent.value)
        p = np.argpartition(d, npr - 1, axis=1)[:, :npr].astype(np.int32)
        return pd.Series(list(p))

    q_path = stage_parquet(
        queries_df.select(
            F.col(query_id),
            F.col(vec_col),
            probe_cids(F.col(vec_col)).alias("probes"),
        ),
        storage_dir,
    )
    files = list_staged_files(q_path)
    if not files:
        return spark.createDataFrame([], _RANKED_SCHEMA)

    def _query_side():
        """(qids, qmat, uniq_cids, bounds, flat_rows): the inverted probe
        index as three flat arrays (cid j's query rows are
        flat_rows[bounds[j]:bounds[j+1]]) rather than a dict — a pure
        tuple-of-ndarrays artifact is host-shareable under
        SPARK_GRAFT_SHARED_STAGE (sources/staging.py), which matters
        here: qmat alone is ~2.6 GB at the 10^7 full-training scale.
        With the probe GEMM done distributed at staging time, this build
        is read + two sorts — cheap enough that the one worker per host
        that pays it no longer serializes the stage."""
        import pyarrow.fs as pafs
        import pyarrow.parquet as pq

        from mysteryann_spark.sources.staging import table_ragged

        fs, first = pafs.FileSystem.from_uri(files[0])
        rel = [first] + [pafs.FileSystem.from_uri(p)[1] for p in files[1:]]
        tbl = pq.read_table(
            rel, filesystem=fs, columns=[query_id, vec_col, "probes"]
        )
        if tbl.num_rows == 0:
            return None
        qids, qmat = table_matrix(tbl, query_id, vec_col)
        # same stable id-argsort as table_matrix, so row i of the ragged
        # view is row i of qmat
        _, indptr, flat_cids = table_ragged(tbl, query_id, "probes")
        flat_cids = flat_cids.astype(np.int64)
        flat_rows = np.repeat(
            np.arange(len(qids), dtype=np.int64), np.diff(indptr)
        )
        order = np.argsort(flat_cids, kind="stable")
        flat_cids, flat_rows = flat_cids[order], flat_rows[order]
        uniq, starts = np.unique(flat_cids, return_index=True)
        bounds = np.append(starts, len(flat_cids))
        return qids, qmat, uniq, bounds, flat_rows

    # base side: assign each row to its L2-nearest centroid in routing
    # space, then ONE shuffle on cid so each Arrow batch holds long
    # contiguous runs of the same inverted list (big GEMMs, not
    # fragments). This is the cid-partitioning the persisted IVF index
    # (sources/ann_index_io.py) stores on disk.
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(IntegerType())
    def assign_cid(vecs: pd.Series) -> pd.Series:
        m = _route(metric, np.stack([np.asarray(v, dtype=np.float64) for v in vecs]))
        if bc_route is not None:
            # assignment is ALWAYS L2-nearest in routing space (any
            # metric), so the two-level route applies unconditionally —
            # this is the pass that was a measured ~2.4 h flat wall at
            # the 163,840-list 10^8 geometry
            from mysteryann_spark.operators.similarity import _routed_nearest

            l1_32, indptr = bc_route.value
            out = _routed_nearest(m, _cent32(), l1_32, indptr, 1)[:, 0]
            return pd.Series(out.astype(np.int32))
        d = np_distances("l2", m, bc_cent.value)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    assigned = (
        base_df.select(
            F.col(base_id).cast(LongType()).alias("bid"),
            F.col(vec_col).alias("bvec"),
            assign_cid(F.col(vec_col)).alias("cid"),
        )
        .repartition("cid")
        .sortWithinPartitions("cid")
    )

    def probe_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        loaded = load_staged("ivfknnq|" + "|".join(files), _query_side)
        if loaded is None:
            return
        qids, qmat, inv_cids, inv_bounds, inv_rows = loaded
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf["bid"].to_numpy(dtype=np.int64)
            bmat = np.stack([np.asarray(v, dtype=qmat.dtype) for v in pdf["bvec"]])
            bcids = pdf["cid"].to_numpy(dtype=np.int64)
            # contiguous runs per cid (sorted within partitions)
            run_starts = np.flatnonzero(np.r_[True, bcids[1:] != bcids[:-1]])
            run_bounds = np.append(run_starts, len(bcids))
            for ri in range(len(run_starts)):
                lo, hi = run_bounds[ri], run_bounds[ri + 1]
                j = int(np.searchsorted(inv_cids, bcids[lo]))
                if j >= len(inv_cids) or inv_cids[j] != bcids[lo]:
                    continue
                qrows = inv_rows[inv_bounds[j] : inv_bounds[j + 1]]
                sub_bids = bids[lo:hi]
                sub_bmat = bmat[lo:hi]
                q_chunk = max(1, int(_DMAT_BUDGET_BYTES // max(1, 8 * len(sub_bids))))
                for s in range(0, len(qrows), q_chunk):
                    rows_c = qrows[s : s + q_chunk]
                    dmat = np_distances(metric, qmat[rows_c], sub_bmat)
                    if exclude_self:
                        dmat[qids[rows_c][:, None] == sub_bids[None, :]] = np.inf
                    m = min(k, dmat.shape[1])
                    part = np.argpartition(dmat, m - 1, axis=1)[:, :m]
                    rows_q = np.repeat(np.arange(dmat.shape[0]), m)
                    yield pd.DataFrame(
                        {
                            "qid": qids[rows_c][rows_q],
                            "nn_id": sub_bids[part.ravel()],
                            "dist": dmat[rows_q, part.ravel()],
                        }
                    )

    candidates = assigned.mapInPandas(probe_topk, _CAND_SCHEMA)
    if exclude_self:
        candidates = candidates.where(F.col("dist") != float("inf"))
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nn_id").asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nn_id", "dist", "rank")
    )


def ivf_knn_join_arrays(
    queries_df: DataFrame, base_df: DataFrame, k: int, metric: str = "l2", **kwargs
) -> DataFrame:
    """IVF-routed approximate kNN in the reference's per-query list shape
    (LoadLearnBaseKNN) — the drop-in sub-quadratic feed for the graph
    build's phase 1."""
    from mysteryann_spark.operators.knn import flat_to_arrays

    return flat_to_arrays(ivf_knn_join(queries_df, base_df, k, metric, **kwargs))
