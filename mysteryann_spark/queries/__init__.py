"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a named (spark_fn, duckdb_oracle_sql) pair, aggregated by
``mysteryann_spark.queries.registry``.
"""

from mysteryann_spark.queries.base import QuerySpec
from mysteryann_spark.queries.registry import all_queries

__all__ = ["QuerySpec", "all_queries"]
