"""fbin / ibin connectors — the reference's native binary formats.

Layouts (include/efanna2e/util.h):
- fbin  (load_meta/load_data, util.h:106-127,179-211): ``(npts:uint32,
  dim:uint32)`` header, then ``npts * dim`` float32 values row-major.
- ibin  (load_gt_meta/load_gt_data_with_dist, util.h:84-105,129-155):
  ``(nq:uint32, k:uint32)`` header, then ``nq*k`` uint32 neighbor ids,
  then ``nq*k`` float32 distances.

Read side is DISTRIBUTED: rows are fixed-width, so each task seeks to its
own byte range — ``spark.range(npts)`` partitions the id space and every
Arrow batch does one contiguous pread. No driver materialization, scales
to any npts the filesystem can hold. (The path must be visible to
executors — local FS here, a mounted object store on a cluster.)

Write side is single-writer by construction (one file, one header — the
same constraint the reference lives with), streamed from
``toLocalIterator`` so driver memory stays one partition deep. At real
scale you shard instead: the reference's own LAION ingestion does exactly
that with .npy shards (export_fbin_from_npy.py:1-41) — our Parquet
tables ARE the sharded form, so fbin/ibin exist for interop, not as the
primary store.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

_FBIN_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)
_IBIN_SCHEMA = StructType(
    [
        StructField("qid", LongType(), False),
        StructField("nn", ArrayType(LongType()), False),
        StructField("dists", ArrayType(DoubleType()), False),
    ]
)


def fbin_meta(path: str) -> tuple[int, int]:
    """(npts, dim) header — load_meta (util.h:106-127), incl. the file
    size validation."""
    with open(path, "rb") as f:
        npts, dim = struct.unpack("<II", f.read(8))
    expected = 8 + npts * dim * 4
    actual = os.path.getsize(path)
    if actual != expected:
        raise ValueError(f"fbin size mismatch: {actual} != {expected} for {path}")
    return npts, dim


def read_fbin(spark: SparkSession, path: str) -> DataFrame:
    """fbin -> (vec_id, embedding ARRAY<FLOAT>); vec_id is the row index,
    matching the reference's implicit positional ids."""
    npts, dim = fbin_meta(path)

    def read_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            lo, hi = int(ids.min()), int(ids.max())
            with open(path, "rb") as f:
                f.seek(8 + lo * dim * 4)
                block = np.frombuffer(
                    f.read((hi - lo + 1) * dim * 4), dtype=np.float32
                ).reshape(hi - lo + 1, dim)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(block[ids - lo])}
            )

    return spark.range(npts).select(F.col("id")).mapInPandas(read_rows, _FBIN_SCHEMA)


def write_fbin(df: DataFrame, path: str, id_col: str = "vec_id", vec_col: str = "embedding") -> tuple[int, int]:
    """(vec_id, embedding) -> fbin, rows ordered by id. Returns (npts, dim)."""
    ordered = df.select(F.col(id_col), F.col(vec_col)).orderBy(id_col)
    dim = len(df.select(vec_col).head()[0])
    npts = 0
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<II", 0, dim))
        for row in ordered.toLocalIterator():
            vec = np.asarray(row[1], dtype=np.float32)
            if vec.shape != (dim,):
                raise ValueError(f"row {row[0]}: dim {vec.shape} != {dim}")
            f.write(vec.tobytes())
            npts += 1
        f.seek(0)
        f.write(struct.pack("<II", npts, dim))
    os.replace(tmp, path)
    return npts, dim


def ibin_meta(path: str) -> tuple[int, int]:
    """(nq, k) header — load_gt_meta (util.h:84-105): the file holds ids
    AND dists, hence the 2x size check."""
    with open(path, "rb") as f:
        nq, k = struct.unpack("<II", f.read(8))
    expected = 8 + nq * k * 4 * 2
    actual = os.path.getsize(path)
    if actual != expected:
        raise ValueError(f"ibin size mismatch: {actual} != {expected} for {path}")
    return nq, k


def read_ibin(spark: SparkSession, path: str) -> DataFrame:
    """Ground-truth ibin -> (qid, nn ARRAY<BIGINT>, dists ARRAY<DOUBLE>) —
    what load_gt_data_with_dist materializes (util.h:129-155); the shape
    our exact kNN join emits (knn_join_arrays + dists)."""
    nq, k = ibin_meta(path)
    dist_base = 8 + nq * k * 4

    def read_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            lo, hi = int(ids.min()), int(ids.max())
            n = hi - lo + 1
            with open(path, "rb") as f:
                f.seek(8 + lo * k * 4)
                nn = np.frombuffer(f.read(n * k * 4), dtype=np.uint32).reshape(n, k)
                f.seek(dist_base + lo * k * 4)
                dd = np.frombuffer(f.read(n * k * 4), dtype=np.float32).reshape(n, k)
            yield pd.DataFrame(
                {
                    "qid": ids,
                    "nn": list(nn[ids - lo].astype(np.int64)),
                    "dists": list(dd[ids - lo].astype(np.float64)),
                }
            )

    return spark.range(nq).select(F.col("id")).mapInPandas(read_rows, _IBIN_SCHEMA)


def write_ibin(df: DataFrame, path: str, qid_col: str = "qid", nn_col: str = "nn", dist_col: str = "dists") -> tuple[int, int]:
    """(qid, nn, dists) -> ground-truth ibin, rows ordered by qid."""
    ordered = df.select(qid_col, nn_col, dist_col).orderBy(qid_col)
    k = len(df.select(nn_col).head()[0])
    all_nn: list[np.ndarray] = []
    all_dd: list[np.ndarray] = []
    for row in ordered.toLocalIterator():
        nn = np.asarray(row[1], dtype=np.uint32)
        dd = np.asarray(row[2], dtype=np.float32)
        if nn.shape != (k,) or dd.shape != (k,):
            raise ValueError(f"qid {row[0]}: expected {k} ids+dists")
        all_nn.append(nn)
        all_dd.append(dd)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<II", len(all_nn), k))
        f.write(np.concatenate(all_nn).tobytes())
        f.write(np.concatenate(all_dd).tobytes())
    os.replace(tmp, path)
    return len(all_nn), k
