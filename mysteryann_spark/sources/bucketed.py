"""Bucketed-table support — the persisted co-partitioning that turns the
biggest fact-fact joins shuffle-free.

At 100 TB the dominant cost of ``lineitem ⋈ orders`` is shuffling both
fact tables on the join key for every query. Bucketing pays that shuffle
ONCE at write time: both tables are hash-clustered into the same number of
buckets on the key (``bucketBy`` + ``sortBy``), and every subsequent
sort-merge join reads co-located, pre-sorted buckets — the physical plan
carries no Exchange on either side (asserted in tests/test_plans.py).
This is Spark's native rendering of the reference's "keep related data
resident together" regime, applied to relational scale.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_PREPARED: dict = {}


def bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 8,
    source: str = "",
) -> DataFrame:
    """Persist ``df`` as a bucketed+sorted table (once per session per
    source dataset) and return the catalog-backed DataFrame whose scan
    reports the bucket layout to the planner.

    ``source`` identifies the dataset the DataFrame was derived from
    (e.g. the sf_dir path): it is folded into both the cache key and the
    table/path name, so the same logical name run against a second
    dataset in one session materializes a second table instead of
    silently reusing the first one's buckets."""
    tag = hashlib.md5(source.encode()).hexdigest()[:8] if source else "default"
    name = f"{name}_{tag}"
    cache_key = (id(spark.sparkContext), name, key, n_buckets)
    if cache_key not in _PREPARED:
        path = os.path.join(
            tempfile.gettempdir(), "mysteryann_buckets", f"{name}_{key}_{n_buckets}"
        )
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", path)
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
        _PREPARED[cache_key] = name
    return spark.table(name)
