"""Training-shard sink gates: deterministic routing, write/read
round-trip, one-file-per-shard layout, and manifest consistency."""

import os

from pyspark.sql import functions as F

from mysteryann_spark.functions.text import token_count
from mysteryann_spark.sources.shards import (
    assign_shards,
    read_training_shards,
    shard_manifest,
    write_training_shards,
)

SF_TINY = "/root/testdata/sf0.001"


def _docs(spark):
    from mysteryann_spark.sources.tables import load_table

    return load_table(spark, "documents", SF_TINY)


def test_assignment_is_deterministic_and_bounded(spark):
    d = _docs(spark)
    a1 = {r["doc_id"]: r["shard"] for r in assign_shards(d, 16, "doc_id").collect()}
    a2 = {r["doc_id"]: r["shard"] for r in assign_shards(d, 16, "doc_id").collect()}
    assert a1 == a2
    assert set(a1.values()) <= set(range(16))
    # md5 routing should actually spread: no shard holds >25% of 500 docs
    from collections import Counter

    assert max(Counter(a1.values()).values()) < 125


def test_write_read_roundtrip_and_layout(spark, tmp_path):
    d = _docs(spark).select("doc_id", "text", "source")
    path = str(tmp_path / "shards")
    write_training_shards(d, path, 8, "doc_id")

    dirs = sorted(x for x in os.listdir(path) if x.startswith("shard="))
    assert len(dirs) == 8
    # one writer task per shard -> exactly one parquet data file per dir
    for sd in dirs:
        files = [f for f in os.listdir(f"{path}/{sd}") if f.endswith(".parquet")]
        assert len(files) == 1, f"{sd}: {files}"

    back = read_training_shards(spark, path)
    assert back.count() == d.count()
    orig = {r["doc_id"]: r["text"] for r in d.collect()}
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == orig
    # partition column round-trips as the assignment
    expected = {r["doc_id"]: r["shard"] for r in assign_shards(d, 8, "doc_id").collect()}
    assert {r["doc_id"]: int(r["shard"]) for r in back.collect()} == expected


def test_manifest_matches_written_shards(spark, tmp_path):
    d = _docs(spark).select("doc_id", "text")
    path = str(tmp_path / "shards")
    write_training_shards(d, path, 8, "doc_id")
    man = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["min_key"], r["max_key"])
        for r in shard_manifest(d, 8, "doc_id", token_count("text")).collect()
    }
    actual = {
        int(r["shard"]): (r["n"], r["t"], r["mn"], r["mx"])
        for r in read_training_shards(spark, path)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.sum(token_count("text")).alias("t"),
            F.min("doc_id").alias("mn"),
            F.max("doc_id").alias("mx"),
        )
        .collect()
    }
    assert man == actual


def test_streaming_write_to_shards(spark, tmp_path):
    """The streaming half of the sink story: a readStream source routed
    through the SAME md5 shard assignment and written with a partitioned
    file sink must land every event exactly once in its deterministic
    shard directory — so a live ingest and a batch backfill produce
    identical shard membership."""
    from mysteryann_spark.sources.shards import assign_shards, shard_col
    from mysteryann_spark.streaming.windows import read_events_stream

    events = read_events_stream(spark, SF_TINY).select("event_id", "event_type")
    out = str(tmp_path / "out")
    q = (
        assign_shards(events, 8, "event_id")
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .partitionBy("shard")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()

    import os as _os

    dirs = [d for d in _os.listdir(out) if d.startswith("shard=")]
    assert len(dirs) >= 2
    back = spark.read.parquet(out)
    from mysteryann_spark.sources.tables import load_table

    batch = load_table(spark, "events", SF_TINY).select(
        "event_id", shard_col(F.col("event_id"), 8)
    )
    expect = {r["event_id"]: r["shard"] for r in batch.collect()}
    got = {r["event_id"]: int(r["shard"]) for r in back.collect()}
    assert got == expect
