"""Event-time windowing queries — SURVEY.md §2.11.

The reference has no streaming at all; these are the Spark-native
equivalents run in batch over the ``events`` table so the DuckDB oracle
applies (true Structured Streaming versions of the same aggregations live
in mysteryann_spark/streaming/ and are parity-tested against these batch
results in tests/test_streaming.py).

All window starts are rendered as UTC strings: Spark session timezone is
pinned per-query (ensure_utc) because the driver's session isn't
guaranteed UTC, while DuckDB reads parquet timestamps as naive UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysteryann_spark.queries.base import QuerySpec, stable_round
from mysteryann_spark.session import ensure_utc
from mysteryann_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, "events", sf_dir)


# --- tumbling window --------------------------------------------------------


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


_TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
"""


# --- sliding window ---------------------------------------------------------


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour: every event lands in 2 windows."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            stable_round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.date_format("w.start", _TS_FMT).alias("win_start"), "n", "n_users", "avg_value")
    )


_SLIDING_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts) - o * INTERVAL '1 hour', '%Y-%m-%d %H:%M:%S') AS win_start,
       count(*) AS n, count(DISTINCT user_id) AS n_users, round(avg(value) + 1e-9, 6) AS avg_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o)
GROUP BY 1
"""


# --- sessionization (gap-based) --------------------------------------------


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user (the batch rendering of
    session_window: lag + gap flag + running sum). Gap math in integer
    microseconds on both engines."""
    e = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.when(
        F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.withColumn("new_sess", gap).withColumn("session_id", F.sum("new_sess").over(run))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT_US).alias("sess_start"),
        F.expr("(max(us) - min(us)) div 1000").alias("duration_ms"),
    )


_SESSION_SQL = """
WITH e AS (SELECT *, epoch_us(ts) AS us FROM events),
g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS session_id
      FROM g)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
       (max(us) - min(us)) // 1000 AS duration_ms
FROM s GROUP BY user_id, session_id
"""


# --- as-of join -------------------------------------------------------------


def events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: the most recent click event id of the same
    user at-or-before it (as-of backward join, rendered with an
    ignore-nulls last() window)."""
    e = _events(spark, sf_dir).where(F.col("event_type").isin("click", "error"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    tagged = e.withColumn("prev_click_id", F.last(click_id, ignorenulls=True).over(w))
    return tagged.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "prev_click_id"
    )


_ASOF_SQL = """
WITH u AS (SELECT event_id, user_id, ts, event_type,
                  CASE WHEN event_type = 'click' THEN event_id END AS click_id
           FROM events WHERE event_type IN ('click', 'error')),
w AS (SELECT *, last_value(click_id IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click_id
      FROM u)
SELECT event_id, user_id, prev_click_id FROM w WHERE event_type = 'error'
"""


# --- pivot ------------------------------------------------------------------

_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    pivoted = e.groupBy("user_id").pivot("event_type", _TYPES).agg(F.count(F.lit(1)))
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in _TYPES],
    )


_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'error') AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-shaped interval join: every (view, purchase) pair of
    the same user with the purchase at most 30 minutes after the view.
    Batch twin of the stream-stream join in streaming/windows.py (which
    adds watermarks to bound state); equi-key on user_id so the range
    predicate only post-filters the co-partitioned join."""
    e = _events(spark, sf_dir)
    v = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    return (
        v.join(p, "user_id")
        .where(
            (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .select("user_id", "view_id", "purchase_id")
    )


_INTERVAL_SQL = """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinalities next to their exact counts: distinct
    users per event type via approx_count_distinct (rsd=0.02) and exact
    count_distinct side by side. At 100 TB the sketch is the only
    affordable distinct — fixed-size state, map-side mergeable, one
    shuffle of sketches instead of raw keys. Rows-only (the sketch
    estimate is implementation-defined); the relative-error bound is
    gated in tests/test_streaming.py."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )


def stream_tumbling_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRUE Structured Streaming tumbling aggregation, hash-oracled:
    readStream over the events feed -> watermarked window agg -> memory
    sink (availableNow), returning the materialized complete-mode result.
    Batch parity is not just tested here — the driver hash-compares the
    STREAMING output against the same DuckDB oracle the batch twin
    (events_tumbling) uses, making the streaming path a first-class
    verified operator rather than a test-only analog."""
    from mysteryann_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        stream_tumbling_counts,
    )

    ensure_utc(spark)
    out = run_stream_to_memory(
        stream_tumbling_counts(read_events_stream(spark, sf_dir)),
        "stream_tumbling_reg",
        output_mode="complete",
    )
    return out


def stream_dedup_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery, hash-oracled:
    the events feed is delivered TWICE in separate micro-batches (the
    Kafka-redelivery stand-in) and dropDuplicatesWithinWatermark must
    emit each event exactly once — so the streaming output equals plain
    SELECT-from-events, which is exactly what the oracle checks. State is
    keyed on event_id and expires with the watermark (O(window), not
    O(stream))."""
    from mysteryann_spark.streaming.windows import (
        read_events_stream_duplicated,
        run_stream_to_memory,
        stream_dedup_exact,
    )

    ensure_utc(spark)
    out = run_stream_to_memory(
        stream_dedup_exact(read_events_stream_duplicated(spark, sf_dir)),
        "stream_dedup_reg",
        output_mode="append",
    )
    return out.select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    )


_STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type, round(value, 6) AS value FROM events
"""


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active week, then
    distinct active users per (cohort, weeks-since-cohort) cell — the
    canonical product-analytics rollup. Two map-side-combined aggregates
    and one equi-join on user_id; week truncation is ISO-Monday in both
    engines, and ages are exact multiples of 7 days so the integer
    division is tie-free."""
    e = _events(spark, sf_dir)
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        act.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort",
            (F.datediff("week", "cohort") / 7).cast("bigint").alias("age_weeks"),
        )
        .groupBy("cohort", "age_weeks")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "age_weeks",
            "n_users",
        )
    )


_RETENTION_SQL = """
WITH act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
c AS (SELECT user_id, min(week) AS cohort FROM act GROUP BY user_id)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort, week) / 7 AS BIGINT) AS age_weeks,
       count(DISTINCT act.user_id) AS n_users
FROM act JOIN c USING (user_id)
GROUP BY 1, 2
"""


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per user, consecutive event pairs in
    event-time order (lag over the per-user stream), counted globally —
    the Markov-chain view of user behavior. One shuffle on user_id for
    the lag, then a map-side-combined count over at most |types|^2
    groups."""
    e = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        e.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )


_TRANSITIONS_SQL = """
WITH t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id) AS from_type,
                  event_type AS to_type
           FROM events)
SELECT from_type, to_type, count(*) AS n
FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2
"""


def stream_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup detection at ingest: the documents table
    arrives as a file-source stream, MinHash-banded statelessly, and each
    (band, bucket) keeps capacity-capped representative token sets in
    applyInPandasWithState — arriving docs exact-Jaccard-verify against
    the bucket's reps (no false merges from LSH collisions) and either
    match or register. Returns the per-doc assignment (min matched rep,
    or self). Rows-only; the planted-truth cross-batch gate lives in
    tests/test_streaming.py (test_stream_dedup_neardup_planted)."""
    from mysteryann_spark.streaming.dedup import (
        assign_reps,
        read_documents_stream,
        stream_dedup_neardup,
    )
    from mysteryann_spark.streaming.windows import run_stream_to_memory

    decisions = run_stream_to_memory(
        stream_dedup_neardup(
            read_documents_stream(spark, sf_dir),
            num_perm=32, bands=8, threshold=0.7,
        ),
        "stream_neardup_reg",
        output_mode="append",
    )
    return assign_reps(decisions)


QUERIES: dict[str, QuerySpec] = {
    "events_approx_distinct": QuerySpec(events_approx_distinct, None),
    "stream_neardup_docs": QuerySpec(stream_neardup_docs, None),
    "stream_tumbling_oracled": QuerySpec(stream_tumbling_oracled, _TUMBLING_SQL),
    "stream_dedup_oracled": QuerySpec(stream_dedup_oracled, _STREAM_DEDUP_SQL),
    "events_tumbling": QuerySpec(events_tumbling, _TUMBLING_SQL),
    "events_interval_join": QuerySpec(events_interval_join, _INTERVAL_SQL),
    "events_sliding": QuerySpec(events_sliding, _SLIDING_SQL),
    "events_sessionize": QuerySpec(events_sessionize, _SESSION_SQL),
    "events_asof_click": QuerySpec(events_asof_click, _ASOF_SQL),
    "events_pivot": QuerySpec(events_pivot, _PIVOT_SQL),
    "events_retention": QuerySpec(events_retention, _RETENTION_SQL),
    "events_transitions": QuerySpec(events_transitions, _TRANSITIONS_SQL),
}
