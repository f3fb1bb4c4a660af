"""Physical-plan inspection — the optimizer audit surface.

SURVEY.md §4: the reference has no optimizer (the program IS the plan);
everything in that vein comes from Catalyst, for free, IF the queries are
expressed declaratively enough for pushdown / pruning / broadcast
selection to fire. These helpers make that a testable property instead of
a hope: tests assert that the flagship star join broadcasts its dims and
that scans read only the referenced columns with filters pushed down
(tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text, returned instead of printed."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def scan_read_schemas(df: DataFrame) -> list[list[str]]:
    """Column names each parquet scan actually reads (column pruning audit)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Flattened PushedFilters entries across all scans (pushdown audit)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def _count_nodes(df: DataFrame, name: str) -> int:
    # formatted explain prints each operator twice (tree + numbered
    # details); count only the unique "(N) OpName" detail headers
    return len(re.findall(rf"(?m)^\(\d+\) {name}\b", formatted_plan(df)))


def count_broadcast_joins(df: DataFrame) -> int:
    return _count_nodes(df, "BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes excluding broadcast exchanges — each is a real
    cluster-wide shuffle at scale."""
    return _count_nodes(df, "Exchange")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions — wider/fewer is better; zero
    means the plan fell off the codegen path entirely.

    Under AQE the pre-execution plan is just ``AdaptiveSparkPlan`` with no
    codegen assignment, so this EXECUTES the frame (collect — count would
    finalize a different, derived plan) and reads the finalized plan's
    ``*(N)`` markers."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", final)))
