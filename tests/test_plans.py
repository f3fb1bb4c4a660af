"""Optimizer audits: the declared plans must actually get Catalyst's
pushdown / pruning / broadcast treatment (SURVEY.md §4)."""

from mysteryann_spark.plans.inspect import (
    count_broadcast_joins,
    count_shuffles,
    pushed_filters,
    scan_read_schemas,
    wholestage_codegen_spans,
)
from mysteryann_spark.queries.registry import all_queries
from tests.conftest import SF_DIR


def test_flagship_plan_broadcasts_dims_and_prunes_columns(spark):
    df = all_queries()["flagship_revenue_by_nation"].fn(spark, SF_DIR)
    # 4 dims (orders/customer/nation/region) all broadcast against lineitem
    assert count_broadcast_joins(df) == 4
    # the lineitem scan reads only the referenced columns
    schemas = scan_read_schemas(df)
    fact = max(schemas, key=len)
    assert set(fact) <= {"l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"}
    # shipdate range predicate reached the scan
    assert any("l_shipdate" in f and "GreaterThan" in f for f in pushed_filters(df))
    assert wholestage_codegen_spans(df) >= 1


def test_pricing_summary_pushdown_and_single_shuffle(spark):
    df = all_queries()["pricing_summary"].fn(spark, SF_DIR)
    assert any("l_shipdate" in f for f in pushed_filters(df))
    # partial agg -> exchange on group keys -> final agg: exactly one shuffle
    assert count_shuffles(df) == 1


def test_filter_project_reads_minimal_schema(spark):
    df = all_queries()["filter_project"].fn(spark, SF_DIR)
    schemas = scan_read_schemas(df)
    assert schemas and all(len(s) <= 6 for s in schemas)
    assert pushed_filters(df)
