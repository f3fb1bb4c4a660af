"""Relational floor (SURVEY.md §2.2-§2.8 "Spark built-ins" rows + M0).

The reference has no relational operators; everything here is the
Catalyst-native operator set declared over the driver's star schema, each
with an exact DuckDB oracle. Plans are left declarative so predicate
pushdown / column pruning / join selection / AQE come free — at 100 TB the
same code runs with filters in the parquet scan, broadcast joins for the
dims (region/nation/part/supplier fit in memory at any SF), and shuffle
joins sized by AQE for the fact-fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysteryann_spark.queries.base import QuerySpec, stable_round
from mysteryann_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --- flagship: star join (lineitem⋈orders⋈customer⋈nation⋈region) ----------


def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation over a shipdate slice.

    Fact-fact join (lineitem⋈orders) shuffles on orderkey; customer joins on
    custkey; nation/region are broadcast (25 / 5 rows at every SF — the
    classic star-schema small-dim broadcast).
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


_FLAGSHIP_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""


# --- TPC-H Q1-style pricing summary (multi-agg groupBy) --------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "2001-09-01")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
        ).alias("sum_charge"),
        stable_round(F.avg("l_quantity"), 6).alias("avg_qty"),
        stable_round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        stable_round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity) + 1e-9, 6) AS avg_qty,
       round(avg(l_extendedprice) + 1e-9, 6) AS avg_price,
       round(avg(l_discount) + 1e-9, 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- scan / filter / project (pushdown exercise) ---------------------------


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushed into the parquet scan (PushedFilters /
    ReadSchema in .explain — only 3 of 6 columns read)."""
    return (
        _t(spark, sf_dir, "orders")
        .where((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 50000))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


_FILTER_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 50000
"""


# --- global top-k (sort + limit) -------------------------------------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by (price desc, key asc) — TakeOrderedAndProject
    physical op: per-partition heaps + driver merge, no full sort at scale."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


_TOPK_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# --- window: rank per group ------------------------------------------------


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rnk")
    )


_WRANK_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rnk
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders)
WHERE rnk <= 3
"""


# --- window: running aggregate + lag ---------------------------------------


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
    )


_WRUN_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
FROM orders
"""


# --- semi / anti joins ------------------------------------------------------


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select("c_custkey", "c_name")


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no pending ('P') orders — 'P' is the rare status, so
    the result is non-trivially between 0 and all customers."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select("c_custkey", "c_mktsegment")


_ANTI_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""


# --- distinct aggregates ----------------------------------------------------


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


_DISTINCT_SQL = """
SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- rollup / cube ----------------------------------------------------------


def rollup_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_bal",
        )
    )


_ROLLUP_SQL = """
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- set operations ---------------------------------------------------------


def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT in one result, tagged."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cust_nations = c.select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_nations = s.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust_nations.intersect(supp_nations).withColumn("tag", F.lit("both"))
    cust_only = cust_nations.exceptAll(supp_nations).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(cust_only)


_SETOPS_SQL = """
SELECT nationkey, 'both' AS tag
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'cust_only' AS tag
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
"""


# --- string scalar functions ------------------------------------------------


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.upper(F.trim("p_brand")).alias("brand_upper"),
    )


_STRING_SQL = """
SELECT p_partkey, lower(p_name) AS name_lower, substr(p_type, 1, 5) AS type_prefix,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       CAST(length(p_name) AS BIGINT) AS name_len,
       p_brand || '|' || p_type AS brand_type,
       upper(trim(p_brand)) AS brand_upper
FROM part
"""


# --- date functions ---------------------------------------------------------


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysteryann_spark.session import ensure_utc

    ensure_utc(spark)
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .withColumn("order_year", F.year("o_orderdate").cast("bigint"))
        .withColumn("order_quarter", F.quarter("o_orderdate").cast("bigint"))
        .groupBy("order_year", "order_quarter", "order_month")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


_DATE_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1, 2, 3
"""


# --- JSON extraction --------------------------------------------------------


def json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            stable_round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
        )
    )


_JSON_SQL = """
SELECT event_type, count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) + 1e-9, 6) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
FROM events GROUP BY event_type
"""


# --- CASE expression bucketing ---------------------------------------------


def case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 25000, "small")
        .when(F.col("o_totalprice") < 100000, "medium")
        .otherwise("large")
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), stable_round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


_CASE_SQL = """
SELECT CASE WHEN o_totalprice < 25000 THEN 'small'
            WHEN o_totalprice < 100000 THEN 'medium'
            ELSE 'large' END AS bucket,
       count(*) AS n, round(avg(o_totalprice) + 1e-9, 6) AS avg_price
FROM orders GROUP BY 1
"""


# --- broadcast join + agg on part dim --------------------------------------


def brand_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


_BRAND_SQL = """
SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- math scalar functions --------------------------------------------------


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil("l_tax").cast("bigint").alias("tax_ceil"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_decile"),
    )


_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(pow(l_discount, 2), 6) AS disc_sq,
       abs(l_quantity - 25) AS qty_dev,
       CAST(ceil(l_tax) AS BIGINT) AS tax_ceil,
       CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile
FROM lineitem WHERE l_orderkey < 500
"""


def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over orders: totals by (priority), by (status), and
    grand total in one pass — the §2.4 grouping-sets surface, expressed
    through the SQL API (also part of the engine's query surface)."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per user: signup -> first view after signup ->
    first purchase after that view; counts users reaching each step.
    Conditional ordered aggregation — the retention/funnel shape every
    event pipeline needs."""
    e = load_table(spark, "events", sf_dir)
    firsts = (
        e.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        )
    )
    views = (
        e.where(F.col("event_type") == "view")
        .join(firsts, "user_id")
        .where(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .join(views, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    signed = firsts.where(F.col("t_signup").isNotNull())
    return spark.createDataFrame(
        [], "step string, users bigint"
    ).unionByName(
        signed.agg(F.lit("1_signup").alias("step"), F.count("*").alias("users"))
    ).unionByName(
        views.agg(F.lit("2_view").alias("step"), F.count("*").alias("users"))
    ).unionByName(
        purchases.agg(F.lit("3_purchase").alias("step"), F.count("*").alias("users"))
    )


_FUNNEL_SQL = """
WITH s AS (SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS t_signup
           FROM events GROUP BY user_id),
v AS (SELECT e.user_id, min(e.ts) AS t_view
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts >= s.t_signup GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.t_view GROUP BY e.user_id)
SELECT '1_signup' AS step, count(*) AS users FROM s WHERE t_signup IS NOT NULL
UNION ALL SELECT '2_view', count(*) FROM v
UNION ALL SELECT '3_purchase', count(*) FROM p
"""


# --- correlated-style subquery (per-nation above-average balance) ----------


def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance — decorrelated into a
    broadcast join against the per-nation aggregate (what Catalyst does to
    the correlated subquery form)."""
    c = _t(spark, sf_dir, "customer")
    nat_avg = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.avg("c_acctbal").alias("nat_avg"))
    return (
        c.join(F.broadcast(nat_avg), F.col("c_nationkey") == F.col("nk"))
        .where(F.col("c_acctbal") > F.col("nat_avg"))
        .select("c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


_ABOVE_AVG_SQL = """
SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
"""


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-fact join over BUCKETED tables: lineitem and orders are
    persisted hash-clustered + sorted on orderkey (8 buckets each), so
    the sort-merge join reads co-located pre-sorted buckets — zero
    Exchange on either side (asserted in tests/test_plans.py). At 100 TB
    this is the difference between shuffling both fact tables per query
    and paying the shuffle once at ingest. Results are identical to the
    plain join, which is exactly what the oracle checks."""
    from mysteryann_spark.sources.bucketed import bucketed_table

    li = bucketed_table(
        spark,
        load_table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "b_lineitem", "l_orderkey", source=sf_dir,
    )
    o = bucketed_table(
        spark,
        load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority"),
        "b_orders", "o_orderkey", source=sf_dir,
    )
    joined = li.hint("merge").join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-9, 4).alias(
            "revenue"
        ),
    )


_BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def join_skew_topkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: the 20 heaviest lineitem join keys with
    their parts-per-million share of all rows — the measurement that
    decides whether a fact-fact join needs salting or AQE skew handling
    at scale. Map-side-combined count per key, total derived from the
    (small) counts table, top-k via TakeOrderedAndProject (no full sort
    shuffle), share in integer ppm so the result is float-free."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.orderBy(F.desc("n"), "l_suppkey")
        .limit(20)
        .crossJoin(F.broadcast(total))
        .select(
            "l_suppkey",
            "n",
            F.expr("n * 1000000 div total").alias("share_ppm"),
        )
    )


_SKEW_SQL = """
WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
SELECT l_suppkey, n, n * 1000000 // total AS share_ppm
FROM c CROSS JOIN t
ORDER BY n DESC, l_suppkey LIMIT 20
"""


QUERIES: dict[str, QuerySpec] = {
    "join_skew_topkeys": QuerySpec(join_skew_topkeys, _SKEW_SQL),
    "bucketed_join_revenue": QuerySpec(bucketed_join_revenue, _BUCKETED_JOIN_SQL),
    "flagship_revenue_by_nation": QuerySpec(flagship_revenue_by_nation, _FLAGSHIP_SQL),
    "pricing_summary": QuerySpec(pricing_summary, _PRICING_SQL),
    "filter_project": QuerySpec(filter_project, _FILTER_SQL),
    "topk_orders": QuerySpec(topk_orders, _TOPK_SQL),
    "window_rank": QuerySpec(window_rank, _WRANK_SQL),
    "window_running": QuerySpec(window_running, _WRUN_SQL),
    "semi_join_customers": QuerySpec(semi_join_customers, _SEMI_SQL),
    "anti_join_customers": QuerySpec(anti_join_customers, _ANTI_SQL),
    "distinct_agg": QuerySpec(distinct_agg, _DISTINCT_SQL),
    "rollup_customer_balance": QuerySpec(rollup_customer_balance, _ROLLUP_SQL),
    "cube_orders": QuerySpec(cube_orders, _CUBE_SQL),
    "setops_nations": QuerySpec(setops_nations, _SETOPS_SQL),
    "string_functions": QuerySpec(string_functions, _STRING_SQL),
    "date_functions": QuerySpec(date_functions, _DATE_SQL),
    "json_events": QuerySpec(json_events, _JSON_SQL),
    "case_buckets": QuerySpec(case_buckets, _CASE_SQL),
    "brand_sales": QuerySpec(brand_sales, _BRAND_SQL),
    "math_functions": QuerySpec(math_functions, _MATH_SQL),
    "grouping_sets_sales": QuerySpec(grouping_sets_sales, _GROUPING_SETS_SQL),
    "funnel_steps": QuerySpec(funnel_steps, _FUNNEL_SQL),
    "above_avg_balance": QuerySpec(above_avg_balance, _ABOVE_AVG_SQL),
}
