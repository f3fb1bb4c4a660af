from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One registry entry: a Spark query plus its DuckDB oracle.

    ``oracle`` is ANSI SQL over the pre-registered views (region nation
    customer supplier part orders lineitem events documents embeddings);
    None marks a genuinely non-SQL-expressible operator (graph-ANN search,
    hash-seeded sketches) that gets the driver's weaker rows-only check and
    a recall/property assertion in tests/ instead.

    Column names and rounding must match between the two sides — the driver
    hash-compares values after sorting columns by name.
    """

    fn: QueryFn
    oracle: str | None = None
