"""Graph-index persistence.

The reference sinks adjacency as a custom binary stream — per-node
``(deg:uint32, nbrs[deg])`` with an ``(ep, npts)`` header for the projection
graph (src/index_bipartite.cpp:2045-2071 Save/Load, :2606-2619
SaveProjectionGraph). Spark-side the index is two Parquet artifacts:

- ``adjacency/``  — rows ``(node BIGINT, nbrs ARRAY<BIGINT>)``
- ``meta/``       — a single-row table carrying the scalar header
                    (entry point, metric, dim, build params)

Parquet keeps the artifact splittable (a 10-billion-node adjacency reads
back as a partitioned scan) and self-describing, which the raw stream isn't.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession

from mysteryann_spark.params import IndexParams


def save_adjacency(adj: DataFrame, path: str) -> None:
    """Sink ``(node, nbrs)`` adjacency (reference Save, src/index_bipartite.cpp:2045)."""
    adj.select("node", "nbrs").write.mode("overwrite").parquet(os.path.join(path, "adjacency"))


def load_adjacency(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "adjacency"))


def save_index(
    adj: DataFrame,
    path: str,
    *,
    entry_point: int,
    dim: int,
    params: IndexParams,
    max_degree: int | None = None,
) -> None:
    """Sink the projection graph + metadata header.

    Mirrors SaveProjectionGraph's ``(ep, npts)`` header
    (src/index_bipartite.cpp:2606-2619) with the extra fields a reader needs
    to search without out-of-band knowledge.

    ``max_degree`` is recorded in the header so loaded-index searches can
    size their broadcast gates without re-scanning the adjacency: the
    builder's connectivity repair may bridge past ``2*M_pjbp``, so the
    parameter cap alone is NOT a guaranteed bound — the MEASURED
    ``max(size(nbrs))`` is. When None (the default) it is measured here,
    once, at save time; ``search_graph_distributed`` previously re-derived
    it with a full adjacency scan on every call that omitted it.
    """
    from pyspark.sql import functions as F

    save_adjacency(adj, path)
    if max_degree is None:
        row = adj.agg(F.max(F.size("nbrs")).alias("d")).head()
        max_degree = int(row["d"]) if row is not None and row["d"] is not None else 0
    spark = adj.sparkSession
    meta = spark.createDataFrame(
        [
            Row(
                entry_point=int(entry_point),
                metric=params.metric,
                dim=int(dim),
                m_sq=params.M_sq,
                m_pjbp=params.M_pjbp,
                l_pjpq=params.L_pjpq,
                seed=params.seed,
                max_degree=int(max_degree),
            )
        ]
    )
    meta.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def load_index(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Load (adjacency DataFrame, metadata dict) — reference LoadProjectionGraph
    (src/index_bipartite.cpp:2097-2117).

    ``meta.get("max_degree")`` (absent on pre-r11 indexes) is the measured
    degree bound recorded at save time — thread it into
    ``search_graph_distributed(max_degree=...)`` so loaded-index searches
    never pay the whole-adjacency ``max(size(nbrs))`` scan."""
    adj = load_adjacency(spark, path)
    meta = spark.read.parquet(os.path.join(path, "meta")).head().asDict()
    return adj, meta


# --- reference BINARY interop ------------------------------------------------
#
# The reference persists indexes in its own little-endian uint32 stream, not
# Parquet. A user holding C++-built RoarGraph index files needs these to move
# between engines without a rebuild:
#
# - projection graph (SaveProjectionGraph/LoadProjectionGraph,
#   src/index_bipartite.cpp:2606-2619 / :2097-2117):
#       ep:u32, npts:u32, then per node: deg:u32, nbrs[deg]:u32
# - bipartite graph (Save/Load, src/index_bipartite.cpp:2045-2071):
#       npts:u32, then per node: deg:u32, nbrs[deg]:u32
#
# The stream is a single sequential FILE — inherently one-writer — but the
# ENCODING is embarrassingly parallel: the record for node i depends only on
# node i's row. Export therefore range-partitions the adjacency by node and
# has each partition vector-encode its contiguous node span into ONE uint32
# blob (header positions and neighbor slots computed with indptr arithmetic
# — no per-record Python); the driver streams the ordered blobs to disk,
# zero-filling inter-partition gaps. Driver memory is bounded by one
# partition's blob, and the per-record Python loop of the previous export
# (toLocalIterator + per-row numpy allocs — the "format-limited sequential"
# wall the 10^6 interop rehearsal measured) is gone. These remain
# EXPORT/IMPORT connectors, not the engine's native sink (that stays
# splittable Parquet). Import parses the file with numpy and hands Spark an
# arrow-backed DataFrame.

# target uint32s per encoded blob (~64 MB) — sizes the range partitioning
_EXPORT_BLOB_U32 = 16 << 20


def _write_adjacency_stream(out, adj: DataFrame, npts: int) -> None:
    """Write per-node ``(deg:u32, nbrs[deg]:u32)`` records for nodes
    0..npts-1 in order; nodes absent from ``adj`` get degree 0 (the
    reference emits every node unconditionally)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    n_edges = adj.select(F.sum(F.size("nbrs"))).collect()[0][0] or 0
    n_parts = max(1, math.ceil((n_edges + npts) / _EXPORT_BLOB_U32))

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["node"].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            if ids[0] < 0 or ids[-1] >= npts:
                raise ValueError(f"node ids outside [0, {npts})")
            if len(np.unique(ids)) != len(ids):
                raise ValueError("duplicate node ids in adjacency export")
            nbr_lists = pdf["nbrs"].to_numpy()[order]
            widths = np.fromiter(
                (len(v) if v is not None else 0 for v in nbr_lists),
                dtype=np.int64, count=len(ids),
            )
            flat = (
                np.concatenate([np.asarray(v, dtype=np.int64) for v in nbr_lists if v is not None and len(v)])
                if widths.sum() else np.empty(0, dtype=np.int64)
            )
            start, end = int(ids[0]), int(ids[-1])
            span = end - start + 1
            dense_deg = np.zeros(span, dtype=np.int64)
            dense_deg[ids - start] = widths
            blob = np.zeros(span + int(dense_deg.sum()), dtype="<u4")
            hdr = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(dense_deg + 1)]
            )[:-1]
            blob[hdr] = dense_deg
            total = int(widths.sum())
            if total:
                tgt = (
                    np.repeat(hdr[ids - start] + 1, widths)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(widths) - widths, widths)
                )
                blob[tgt] = flat
            yield pd.DataFrame(
                {"start": [start], "end": [end], "blob": [blob.tobytes()]}
            )

    blobs = (
        adj.select("node", "nbrs")
        .repartitionByRange(n_parts, "node")
        # explicit local sort: repartitionByRange happens to sort within
        # partitions in current Spark (deterministic-retry sort), but
        # that is an implementation detail, not a contract — the encoder
        # requires contiguous node spans, and this is free when the rows
        # already arrive sorted
        .sortWithinPartitions("node")
        .mapInPandas(encode, "start long, end long, blob binary")
    )
    next_node = 0
    empty = np.zeros(1, dtype="<u4").tobytes()
    for row in blobs.orderBy("start").toLocalIterator():
        start = int(row["start"])
        if start < next_node:
            raise ValueError("overlapping export blobs — adjacency has duplicate nodes")
        out.write(empty * (start - next_node))  # gap → zero-degree records
        out.write(bytes(row["blob"]))
        next_node = int(row["end"]) + 1
    out.write(empty * (npts - next_node))


def _read_adjacency_stream(buf, npts: int | None):
    """Parse ``npts`` ``(deg, nbrs[deg])`` records from a uint32 ndarray
    view positioned at the first record. Returns (degs, flat_nbrs,
    indptr). ``npts=None`` parses records until end-of-file — the NSG
    layout carries no point count (the reference hardcodes 10^6,
    LoadNsgGraph src/index_bipartite.cpp:2078; we recover the true count
    from the stream itself).

    The header walk is sequential by format design (record i+1 starts
    where record i's neighbor run ends), so it can't be a single numpy
    pass — but per-record numpy *scalar* indexing is ~10x slower than
    plain-int arithmetic, so the walk runs over chunked ``.tolist()``
    slices (C-speed bulk conversion, Python ints inside). The neighbor
    gather IS fully vectorized: one ``np.repeat``-built index array maps
    every flat slot to its source position — no per-record slice copies."""
    import numpy as np

    known = npts is not None
    degs = np.empty(npts, dtype=np.int64) if known else None
    degs_l: list[int] = []
    n_buf = len(buf)
    chunk = 1 << 21  # uint32s (~8 MB per slice)
    pos = 0  # absolute offset of the next unread header
    i = 0
    while (i < npts) if known else (pos < n_buf):
        if known and pos >= n_buf:
            raise ValueError(
                f"corrupt adjacency stream: record {i}/{npts} starts past "
                f"end of file ({pos} >= {n_buf} uint32s)"
            )
        local = buf[pos : pos + chunk].tolist()
        limit = len(local)
        off = 0
        while off < limit and (i < npts if known else True):
            d = local[off]
            if known:
                degs[i] = d
            else:
                degs_l.append(d)
            off += 1 + d
            i += 1
        pos += off  # may overshoot `limit` mid-record; headers were in-slice
    if not known:
        npts = i
        degs = np.asarray(degs_l, dtype=np.int64)
    if pos != n_buf:
        raise ValueError(
            f"corrupt adjacency stream: consumed {pos} uint32s, file has {n_buf}"
        )
    indptr = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(degs)])
    starts = np.arange(1, npts + 1, dtype=np.int64) + indptr[:-1]  # header at starts-1
    total = int(indptr[-1])
    src = np.repeat(starts - indptr[:-1], degs) + np.arange(total, dtype=np.int64)
    flat = buf[src].astype(np.int64)
    return degs, flat, indptr


def _adjacency_df(spark: SparkSession, degs, flat, indptr) -> DataFrame:
    import pyarrow as pa

    # LargeList = int64 offsets (a >2^31-edge adjacency overflows plain
    # ListArray offsets). createDataFrame is handed the pyarrow Table
    # DIRECTLY: the pandas detour needed
    # spark.sql.execution.arrow.pyspark.enabled and crashed any vanilla
    # session (the r4 driver failure — CANNOT_INFER_TYPE_FOR_FIELD on the
    # numpy cells); the Table path is Arrow end-to-end on every session.
    nbrs = pa.LargeListArray.from_arrays(pa.array(indptr, type=pa.int64()), pa.array(flat))
    tbl = pa.table({"node": pa.array(range(len(degs)), type=pa.int64()), "nbrs": nbrs})
    return spark.createDataFrame(tbl)


def save_projection_binary(adj: DataFrame, path: str, *, entry_point: int, npts: int) -> None:
    """Export adjacency to the reference's projection-graph binary layout
    (SaveProjectionGraph, src/index_bipartite.cpp:2606-2619):
    ``ep:u32, npts:u32`` then per-node ``(deg:u32, nbrs[deg]:u32)``."""
    import numpy as np

    with open(path, "wb") as out:
        out.write(np.array([entry_point, npts], dtype="<u4").tobytes())
        _write_adjacency_stream(out, adj, npts)


def load_projection_binary(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Import a reference-written projection-graph binary file
    (LoadProjectionGraph, src/index_bipartite.cpp:2097-2117). Returns
    ``(adjacency DataFrame (node, nbrs), entry_point)``."""
    import numpy as np

    raw = np.fromfile(path, dtype="<u4")
    if len(raw) < 2:
        raise ValueError(f"{path}: truncated projection-graph file")
    ep, npts = int(raw[0]), int(raw[1])
    degs, flat, indptr = _read_adjacency_stream(raw[2:], npts)
    return _adjacency_df(spark, degs, flat, indptr), ep


def save_bipartite_binary(adj: DataFrame, path: str, *, npts: int) -> None:
    """Export to the reference's bipartite Save layout
    (src/index_bipartite.cpp:2045-2056): ``npts:u32`` then per-node
    ``(deg:u32, nbrs[deg]:u32)`` over the unified id space (base then
    query nodes)."""
    import numpy as np

    with open(path, "wb") as out:
        out.write(np.array([npts], dtype="<u4").tobytes())
        _write_adjacency_stream(out, adj, npts)


def load_bipartite_binary(spark: SparkSession, path: str) -> DataFrame:
    """Import a reference-written bipartite graph file (Load,
    src/index_bipartite.cpp:2058-2071) as a ``(node, nbrs)`` DataFrame."""
    import numpy as np

    raw = np.fromfile(path, dtype="<u4")
    if len(raw) < 1:
        raise ValueError(f"{path}: truncated bipartite-graph file")
    npts = int(raw[0])
    degs, flat, indptr = _read_adjacency_stream(raw[1:], npts)
    return _adjacency_df(spark, degs, flat, indptr)


def save_nsg_binary(
    adj: DataFrame, path: str, *, entry_point: int, npts: int, width: int | None = None
) -> None:
    """Export adjacency to the third-party NSG graph layout the reference
    can consume (LoadNsgGraph, src/index_bipartite.cpp:2073-2095):
    ``width:u32, ep:u32`` then per-node ``(deg:u32, nbrs[deg]:u32)``
    records to end-of-file — the format carries NO point count. ``width``
    (the format's max-degree header) defaults to the measured max degree."""
    import numpy as np

    from pyspark.sql import functions as F

    if width is None:
        row = adj.agg(F.max(F.size("nbrs")).alias("w")).head()
        width = int(row["w"] or 0)
    with open(path, "wb") as out:
        out.write(np.array([width, entry_point], dtype="<u4").tobytes())
        _write_adjacency_stream(out, adj, npts)


def load_nsg_binary(spark: SparkSession, path: str) -> tuple[DataFrame, int, int]:
    """Import an NSG-format graph file (the reference's third-party index
    interop, LoadNsgGraph src/index_bipartite.cpp:2073-2095 — which
    hardcodes npts=10^6; here the true count comes from the stream).
    Returns ``(adjacency DataFrame (node, nbrs), entry_point, width)``."""
    import numpy as np

    raw = np.fromfile(path, dtype="<u4")
    if len(raw) < 2:
        raise ValueError(f"{path}: truncated NSG graph file")
    width, ep = int(raw[0]), int(raw[1])
    degs, flat, indptr = _read_adjacency_stream(raw[2:], None)
    return _adjacency_df(spark, degs, flat, indptr), ep, width
