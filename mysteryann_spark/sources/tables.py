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

# Inferred-schema memo per table path: schema inference launches a
# footer-read driver job on EVERY spark.read.parquet call, so a query that
# loads two tables re-pays 1-2 small jobs (plus their driver gaps) per
# invocation for metadata that cannot change — the table files are static
# for the life of the path. The memo caches the INFERRED schema (first
# read per path still infers, under the same session confs) and later
# reads pass it explicitly; data reading is unchanged. This memoizes
# metadata only — never rows or results.
#
# ASSUMPTION (r12 ADVICE): the files at a path are never regenerated with
# a DIFFERENT schema inside one process — true for the driver/bench/test
# datasets, which are written once. An in-process fixture that rewrites a
# table with new columns must call ``clear_schema_cache()`` (or use a
# fresh path), or the stale schema would silently null-fill the read.
_SCHEMA_CACHE: dict[str, "object"] = {}


def clear_schema_cache(path: str | None = None) -> None:
    """Drop the memoized inferred schema for ``path`` (or all paths) —
    the escape hatch for test fixtures that rewrite a table in place."""
    if path is None:
        _SCHEMA_CACHE.clear()
    else:
        _SCHEMA_CACHE.pop(path, None)


def table_row_count(name: str, sf_dir: str = DEFAULT_SF_DIR) -> int:
    """EXACT row count of a source table from its parquet footers, read
    driver-side (pyarrow metadata — no Spark job, no data read). Parquet
    footer ``num_rows`` is exact by format contract, so this equals
    ``load_table(...).count()`` while skipping one driver job + its gap
    per call (same remove-the-job class as staging.list_staged_files).
    NOT memoized: every invocation re-reads the footers, so results
    always derive from the current inputs."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):  # single-file table (the testdata layout)
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    from mysteryann_spark.sources.staging import staged_row_count

    return staged_row_count([path])


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # the conf governs the parquet-to-catalyst type mapping at scan
        # time (TIMESTAMP(NANOS) -> bigint), so it is required on the
        # explicit-schema read path too
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cached = _SCHEMA_CACHE.get(path)
    if cached is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(cached).parquet(path)
    return normalize_event_ts(df) if name == "events" else df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to event-time TIMESTAMP (LTZ) whatever the
    writer produced.

    The driver has shipped events.parquet with ts as INT64 TIMESTAMP(NANOS)
    (readable only as raw longs under nanosAsLong) and as TIMESTAMP(MICROS)
    with isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Nanos are truncated
    to micros with integer division (ns epoch values exceed the double
    mantissa, so float division would corrupt microseconds) — matching
    DuckDB's ns->us truncation so the oracle stays comparable; NTZ is cast
    to LTZ, an identity under the UTC session timezone. Both forms are
    per-row Catalyst expressions — fully distributed, no driver conversion,
    scales to any table size.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":  # raw nanos
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt is not None and dt != "timestamp":  # timestamp_ntz
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so spark.sql(...) queries work."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
