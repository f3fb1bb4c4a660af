from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


def stable_round(col: Column | str, scale: int = 6) -> Column:
    """Rounding for averages/ratios of decimal-quantized data.

    An avg of 2-decimal values can land EXACTLY on a round-half boundary
    (e.g. 44.8690625 at scale 6); Spark and DuckDB then accumulate in
    different orders and round to different sides. Nudging by +1e-9 — far
    above cross-engine float noise (~1e-13), far below data resolution —
    moves every such boundary case deterministically up on BOTH engines.
    The SQL oracle must mirror this: round(x + 1e-9, scale).
    """
    return F.round(F.col(col) + F.lit(1e-9) if isinstance(col, str) else col + F.lit(1e-9), scale)


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
