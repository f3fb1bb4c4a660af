"""IVF-PQ index persistence: the similarity-search analog of graph_io.

The reference persists its graph indexes and reloads them for serving
(SaveProjectionGraph/LoadProjectionGraph, src/index_bipartite.cpp:2606-2619,
2097-2117); this module gives the IVF-PQ vector index the same build-once /
search-many lifecycle, in the layout you'd actually use at 100 TB:

- ``<path>/lists/``  — the inverted lists (cid, nn_id, code ARRAY<INT>)
  written ``partitionBy("cid")``: a probe of n_probe lists reads exactly
  n_probe partition directories (Spark's partition pruning does the
  routing; the scan never touches the other 1 - n_probe/n_centroids of
  the data).
- ``<path>/centroids/`` — (cid, centroid ARRAY<DOUBLE>), kilobytes.
- ``<path>/books/``     — (subspace, code, codeword ARRAY<DOUBLE>).
- ``<path>/meta/``      — one-row parquet (metric, dim, m, n_codes,
  n_centroids): parquet rather than a JSON side-file so the whole index
  round-trips through any Hadoop-compatible filesystem with one API.

Model parts are driver-size by construction (the k-means/PQ training
collect is bounded by train_sample, never the data); only ``lists`` scales
with the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def save_ivfpq(
    index: dict,
    path: str,
    base_df=None,
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    vec_dtype: str = "double",
) -> None:
    """Persist a ``build_ivfpq_index`` result. ``lists`` is the only
    mandatory data-scale write; cid-partitioning makes later probes
    partition-pruned scans.

    ``base_df`` (optional) additionally persists the FULL-PRECISION
    vectors as ``<path>/vectors/`` — (cid, nn_id, vec) partitioned by the
    same cid as the lists — so the exact-refine rerank can read just the
    probed lists' vector partitions instead of recomputing or re-shuffling
    the corpus (the measured 10^8 rerank wall, SCALE.md r8). The cid is
    re-derived with the SAME deterministic assignment UDF the lists write
    uses on the same input, so the two datasets agree row-for-row.
    ``vec_dtype="float"`` halves the footprint where the rerank is
    recall-gated rather than pinned (refine distances then differ in the
    float32 rounding of the stored vectors). Measured at 10^8 x 64-d:
    float32 persisted vectors are recall-LOSSLESS vs the float rerank
    base (0.869/0.9133 at probe 32/64, identical through both paths —
    SCALE.md r10), so float is the licensed layout at corpus scale; the
    double default preserves the value-pinned serving entry's exactness
    guarantee.

    Write ORDER is cheapest-first: model parts (kilobytes) before the
    corpus-scale lists and vectors. The models exist only in this
    process — sequencing them after a 25 GB data write meant an ENOSPC
    mid-vectors discarded hours of training with them (measured r11,
    the 10^8 density rebuild); models-first leaves a loadable index
    whose vectors can be BACKFILLED (``save_ivfpq_vectors`` with the
    persisted route) without retraining. A reader that loads during the
    window between the model writes and the lists landing fails on the
    missing ``lists`` dataset — same visibility contract as before,
    where it failed on missing ``meta``.

    A REBUILD over an existing index path stages to a sibling temp dir
    and swaps via rename instead: writing models-first in place would
    open a window where the NEW meta/centroids coexist with the OLD
    lists — a concurrent reader would load a consistent-looking but
    mismatched index (wrong assignments, no error) rather than fail on
    a missing dataset. The swap is a rename pair (old aside, staged in),
    so a concurrent reader sees either the old index, the new index, or
    a briefly-missing path (a clean load error) — never mixed parts."""
    spark = index["lists"].sparkSession

    jvm = spark._jvm
    dest_hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = dest_hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    staged = fs.exists(dest_hpath)
    if staged:
        import uuid

        token = uuid.uuid4().hex[:12]
        dest = f"{path}.__rebuild__-{token}"
    else:
        dest = path
    _write_ivfpq_parts(index, dest, base_df, base_id, vec_col, vec_dtype)
    if staged:
        old = jvm.org.apache.hadoop.fs.Path(f"{path}.__replaced__-{token}")
        if not fs.rename(dest_hpath, old):
            raise IOError(f"index swap: could not move old index aside at {path}")
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(dest), dest_hpath):
            # restore the old index so the path never stays empty
            fs.rename(old, dest_hpath)
            raise IOError(f"index swap: could not move staged rebuild into {path}")
        fs.delete(old, True)


def _write_ivfpq_parts(
    index: dict,
    path: str,
    base_df,
    base_id: str,
    vec_col: str,
    vec_dtype: str,
) -> None:
    spark = index["lists"].sparkSession

    cent = index["centroids"]
    spark.createDataFrame(
        [(i, [float(x) for x in cent[i]]) for i in range(len(cent))],
        "cid int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")

    route = index.get("route")
    if route is not None:
        # two-level assignment structure (hierarchical coarse training,
        # similarity._hierarchical_kmeans): level-1 centroids + child
        # ranges into the flat centroid matrix. Kilobytes; persisted so a
        # later vectors BACKFILL derives cids identically to the lists
        # write (routed and flat assignment differ at cell boundaries,
        # and the two datasets must agree row-for-row).
        l1, indptr = route
        spark.createDataFrame(
            [
                (i, [float(x) for x in l1[i]], int(indptr[i]), int(indptr[i + 1]))
                for i in range(len(l1))
            ],
            "cell int, centroid array<double>, child_start long, child_end long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/route")

    books = index["books"]
    rows = [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, codeword array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/books")

    m = index["meta"]
    spark.createDataFrame(
        [(m["metric"], m["dim"], m["n_centroids"], m["m"], m["n_codes"])],
        "metric string, dim int, n_centroids int, m int, n_codes int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    # repartition ON cid first: partitionBy alone writes one file per
    # (task, cid) pair — up to tasks x n_centroids small files (655k at
    # 10^7 rows / 10,240 lists, a measured chunk of the r7 build wall
    # and the classic small-files failure at cluster scale). Hashing
    # each cid to exactly one task bounds it at one file per list.
    (
        index["lists"]
        .repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(f"{path}/lists")
    )

    if base_df is not None:
        save_ivfpq_vectors(index, path, base_df, base_id, vec_col, vec_dtype)


def save_ivfpq_vectors(
    index: dict,
    path: str,
    base_df,
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    vec_dtype: str = "double",
) -> None:
    """Write just the ``<path>/vectors/`` dataset (see save_ivfpq) — also
    the backfill path for an index persisted before vectors existed.
    ``index`` only needs ``centroids`` (plus ``route`` when the index was
    built with hierarchical assignment — a loaded index carries it);
    pass a loaded index to backfill."""
    spark = base_df.sparkSession
    import numpy as _np

    from mysteryann_spark.operators.similarity import nearest_centroids_udf

    bc = spark.sparkContext.broadcast(index["centroids"])
    route = index.get("route")
    bc_route = (
        spark.sparkContext.broadcast(
            (_np.ascontiguousarray(route[0], dtype=_np.float32), route[1])
        )
        if route is not None
        else None
    )
    (
        base_df.select(
            F.element_at(
                nearest_centroids_udf(bc, 1, route_bc=bc_route)(F.col(vec_col)), 1
            ).alias("cid"),
            F.col(base_id).alias("nn_id"),
            F.col(vec_col).cast(f"array<{vec_dtype}>").alias("vec"),
        )
        .repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(f"{path}/vectors")
    )


def load_ivfpq(spark: SparkSession, path: str) -> dict:
    """Load a persisted IVF-PQ index back into the ``search_ivfpq_index``
    shape. The model parts are collected (kilobytes); ``lists`` stays a
    lazy partition-pruned scan."""
    meta_row = spark.read.parquet(f"{path}/meta").head()
    meta = {
        "metric": meta_row["metric"],
        "dim": int(meta_row["dim"]),
        "n_centroids": int(meta_row["n_centroids"]),
        "m": int(meta_row["m"]),
        "n_codes": int(meta_row["n_codes"]),
    }

    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    if [r["cid"] for r in cent_rows] != list(range(meta["n_centroids"])):
        raise ValueError(f"corrupt index at {path}: centroid ids not contiguous")
    centroids = np.asarray([r["centroid"] for r in cent_rows], dtype=np.float64)

    book_rows = spark.read.parquet(f"{path}/books").orderBy("subspace", "code").collect()
    if len(book_rows) != meta["m"] * meta["n_codes"]:
        raise ValueError(f"corrupt index at {path}: codebook row count mismatch")
    dsub = meta["dim"] // meta["m"]
    books = np.asarray([r["codeword"] for r in book_rows], dtype=np.float64).reshape(
        meta["m"], meta["n_codes"], dsub
    )

    lists = spark.read.parquet(f"{path}/lists").select(
        F.col("cid").cast("int"), "nn_id", "code"
    )
    out = {"lists": lists, "centroids": centroids, "books": books, "meta": meta}

    # optional persisted full-precision vectors (save_ivfpq(base_df=...)):
    # a lazy cid-partitioned scan the refine join partition-prunes.
    # Existence probed through Hadoop's FileSystem, not os.path — the
    # index may live on HDFS/S3, and a reader-side AnalysisException
    # would spew a JVM stack into the logs for the common vectors-less
    # index.
    vec_path = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/vectors")
    fs = vec_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(vec_path):
        out["vectors"] = spark.read.parquet(f"{path}/vectors").select(
            F.col("cid").cast("int"), "nn_id", "vec"
        )

    # optional two-level routing structure (hierarchical coarse training)
    route_path = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/route")
    if fs.exists(route_path):
        rows = spark.read.parquet(f"{path}/route").orderBy("cell").collect()
        if [r["cell"] for r in rows] != list(range(len(rows))):
            raise ValueError(f"corrupt index at {path}: route cells not contiguous")
        l1 = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
        indptr = np.asarray(
            [rows[0]["child_start"]] + [r["child_end"] for r in rows], dtype=np.int64
        )
        out["route"] = (l1, indptr)
    return out
