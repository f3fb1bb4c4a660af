"""Training-shard sink: the output side of an LLM-data pipeline.

After curation (dedup -> quality filter -> mix -> pack), a corpus ships as
a fixed set of shards that trainers stream independently. This module
makes that an engine primitive:

- ``assign_shards``: deterministic md5-derived shard id — retry-stable
  (a re-run of a failed write produces byte-identical shard membership,
  unlike ``rand()`` or ``spark_partition_id()``) and engine-portable
  (the same arithmetic runs in DuckDB, so the manifest is hash-oracled).
- ``write_training_shards``: one ``repartition(shard)`` then
  ``partitionBy(shard)`` parquet write — each shard directory is written
  by exactly one task, so files-per-shard stays 1 instead of
  tasks x shards. At 100 TB you pick n_shards so a shard is a few GB:
  trainers then get sequential scans and the shuffle is the one you were
  always going to pay to group output.
- ``shard_manifest``: per-shard row counts / token sums / id ranges —
  the index a training loader reads first (and the registry's oracled
  surface for this sink).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_col(key: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): first 8 md5 hex chars of
    the key as an integer, mod n_shards. Portable across engines —
    DuckDB: CAST(concat('0x', substr(md5(k), 1, 8)) AS BIGINT) % n."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_shards
    ).alias("shard")


def assign_shards(df: DataFrame, n_shards: int, key_col: str) -> DataFrame:
    return df.withColumn("shard", shard_col(F.col(key_col), n_shards))


def write_training_shards(
    df: DataFrame, path: str, n_shards: int, key_col: str
) -> None:
    """Deterministic sharded parquet write: shard=<i>/ directories, one
    writer task per shard (repartition on the partition column), rows
    ordered by key within each shard file so re-runs are byte-stable."""
    (
        assign_shards(df, n_shards, key_col)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def shard_manifest(
    df: DataFrame, n_shards: int, key_col: str, token_count: Column
) -> DataFrame:
    """Per-shard manifest: (shard, n_docs, n_tokens, min/max key). One
    map-side-combined aggregate over the assignment expression — no write
    required, so the driver can hash-verify the sink's routing logic
    against DuckDB without touching a filesystem."""
    return (
        df.select(
            shard_col(F.col(key_col), n_shards),
            F.col(key_col).alias("key"),
            token_count.alias("toks"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
    )
