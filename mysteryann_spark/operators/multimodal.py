"""Multimodal column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
pattern the reference's WebVid pipeline applies outside the engine
(prepare_for_clip_webvid.py:50-129: fetch tars -> per-frame CLIP embeddings
-> L2-normalize -> mean-pool -> re-normalize). Here the Spark-side plumbing
(schemas, Arrow batch shapes, partitioning) is real and tested; the actual
image/audio decode is stubbed behind ``decode_stub``/NotImplementedError
because no media libraries exist in this container.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_md5", StringType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: text bytes as payload, metadata
    derived arithmetically. Stands in for a real binary ingest so every
    downstream op has a concrete input at all SFs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("fake/"), F.col("source")).alias("mime"),
        (F.lit(16) + F.col("n_chars") % 32).cast("int").alias("width"),
        (F.lit(16) + F.col("doc_id") % 16).cast("int").alias("height"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("n_frames"),
    )


def decode_frames(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Frame-sample each payload: one output row per (media, frame).

    ``real_decode=True`` is the seam where an image/video library would
    decode pixels; unavailable in this container, so it raises. The fake
    path is deterministic (md5 of payload + frame index) and exercises the
    exact mapInPandas batch shape a real decoder would use: binary column
    in, exploded typed rows out, one Arrow batch at a time.
    """
    if real_decode:
        raise NotImplementedError(
            "media decode requires an image/video library not present in "
            "this environment; wire a decoder into _decode_batch"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("media_id", "frame_idx", "frame_md5", "n_bytes")}
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                data = bytes(payload)
                for fi in range(int(n_frames)):
                    h = hashlib.md5(data + fi.to_bytes(4, "little")).hexdigest()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_md5"].append(h)
                    out["n_bytes"].append(len(data))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "n_frames").mapInPandas(
        _decode_batch, _DECODE_SCHEMA
    )


def mean_pool_embeddings(
    emb: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Group-wise mean-pool + L2-renormalize (the WebVid per-video pooling,
    prepare_for_clip_webvid.py:88-101), as pure DataFrame algebra:
    posexplode -> per-(group, pos) avg (map-side combined) -> renormalize.
    Returns (group, n, pooled ARRAY<DOUBLE>)."""
    means = (
        emb.select(group_col, F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(group_col, "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
    )
    pooled = (
        means.groupBy(group_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"),
        )
        .select(
            group_col,
            F.transform("pm", lambda s: s["m"]).alias("mean_vec"),
        )
    )
    norm = F.sqrt(
        F.aggregate(F.transform("mean_vec", lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    counts = emb.groupBy(group_col).agg(F.count("*").alias("n"))
    return (
        pooled.join(counts, group_col)
        .select(
            group_col,
            "n",
            F.transform("mean_vec", lambda x: x / norm).alias("pooled"),
        )
    )


_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Strided frame sampling: keep every ``stride``-th frame of each
    payload (the cheap temporal downsample every video pipeline runs
    before the expensive decode/embed). Same Arrow batch shape as
    decode_frames — binary column in, typed frame rows out; the sampled
    frame's fingerprint is md5(payload + '#' + frame index), computable
    on the raw bytes without a decoder."""

    def _sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("media_id", "frame_idx", "frame_md5")}
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                data = bytes(payload)
                for fi in range(0, int(n_frames), stride):
                    h = hashlib.md5(data + b"#" + str(fi).encode()).hexdigest()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_md5"].append(h)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "n_frames").mapInPandas(
        _sample_batch, _SAMPLE_SCHEMA
    )
