"""SparkSession factory tuned for the local[32] test rig but shaped for a
multi-executor cluster: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow on (pandas-UDF hot paths), UTC session time
(matches the DuckDB oracle's naive-UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mysteryann-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        # At cluster scale shuffle_partitions is sized to data volume; locally
        # ~cores avoids 200-way over-parallelism on tiny inputs.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin session timezone to UTC on an externally-created session.

    ``spark.sql.session.timeZone`` is a runtime conf, so this is safe on a
    session we didn't build (the driver's verify harness creates its own).
    Timestamp-bucketing queries call this so string renderings match the
    DuckDB oracle, which reads parquet timestamps as naive UTC.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
