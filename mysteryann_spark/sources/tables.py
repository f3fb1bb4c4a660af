"""Parquet table sources for the driver's star schema + vector tables.

The reference reads raw fbin/ibin blobs with hand-rolled header validation
(util.h:106-127,179-211); under Spark the source is a partitioned Parquet
scan — schema travels with the file, Catalyst prunes columns and pushes
predicates into the scan, and at 100 TB the same call distributes across
executors with no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark's reader
        # rejects. Read it as raw nanos and truncate to micros with integer
        # division (ns epoch values exceed the double mantissa, so float
        # division would corrupt microseconds). Matches DuckDB's ns->us
        # truncation, keeping the oracle comparable. Fully distributed —
        # no driver-side conversion, scales to any table size.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so spark.sql(...) queries work."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
