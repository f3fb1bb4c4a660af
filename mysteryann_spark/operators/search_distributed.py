"""Distributed frontier-join beam search — the scale path for SURVEY.md
§2.10 Q1 / §3.2 when the index does NOT fit in executor memory.

The broadcast path (operators/search.py) replays the reference's
``SearchRoarGraph`` loop (src/index_bipartite.cpp:2311-2420) per executor;
that requires the whole adjacency + base matrix on every executor — fine
for the single-node reference's regime, wrong at 100 TB. This module is
the Pregel-style rendering: the graph and the vectors stay partitioned,
and one best-first *step for every query at once* becomes a round of
joins:

    pool      = per-query top-L of all visited candidates (window)
    frontier  = best unexpanded pool entry per query          (window)
    expand    = frontier ⋈ adjacency  → new candidate ids     (shuffle on node)
    score     = candidates ⋈ base vectors ⋈ query vectors     (shuffle on id/qid)
    visited  ∪= scored candidates                             (anti-join dedup)

Equivalence: the sequential loop expands, per query, the closest
unexpanded node of the bounded (dist, id)-ordered queue, and its final
queue is exactly the top-L of every node it ever scored. One frontier
round here expands precisely that node for every live query, so the
visited set — and therefore the final top-L pool — is IDENTICAL to the
broadcast path (tested in tests/test_graph.py). Hops = rounds a query
stayed live; cmps = candidates scored. Both derive from the state table
afterwards instead of being counted inline.

Scale notes:
- State (qid, nn_id, dist, expanded) is one row per scored candidate —
  bounded by cmps (~L·avg_degree·hops), NOT by index size; it shuffles
  on qid only at window steps.
- The adjacency join shuffles (qid, node) pairs against the edge table —
  both sides hash-partitioned on the node id; no executor ever holds the
  full graph.
- Per-round cost is dominated by small shuffles; total rounds = max hops
  (~15-40 at reference parameters). This trades latency for unbounded
  index size — exactly Spark's join-vs-broadcast tradeoff, so callers
  pick: broadcast path when the index fits (the common case, and what
  the reference assumes always), frontier path beyond it.
- Lineage is cut per round (localCheckpoint) or the plan would double
  every iteration.
- Plan STATISTICS are reset every ``_STATS_RESET_EVERY`` rounds by a
  parquet round-trip: localCheckpoint cuts lineage but KEEPS the child
  plan's estimated sizeInBytes, and the loop's self-referencing joins
  roughly double those BigInteger bits per round — after enough rounds
  Spark's estimator throws ``ArithmeticException: BigInteger would
  overflow supported range`` (hit at 2x10^4 nodes / ~60 rounds; invisible
  at sf scale). A parquet re-read restarts stats from the real file size;
  values are unchanged, so the broadcast-path bit-parity holds.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysteryann_spark.functions.vector import distance_col
from mysteryann_spark.session import broadcast_if_under

# parquet stats-reset cadence (see module docstring): bits of estimated
# sizeInBytes roughly double per round between resets, so 16 rounds from
# a fresh file-size baseline stays ~6 orders below BigInteger's 2^31-bit
# ceiling while costing one small state write per 16 driver rounds
_STATS_RESET_EVERY = 16


def search_graph_distributed(
    queries_df: DataFrame,
    base_df: DataFrame,
    adj_df: DataFrame,
    entry_point: int,
    k: int,
    l_search: int,
    metric: str = "l2",
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    max_rounds: int = 200,
    expand_width: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """Top-k ANN for every query row without broadcasting the index;
    returns ``(qid, nn_id, dist, rank, cmps, hops)`` — bit-identical to
    ``search.search_graph`` on the same inputs (at the same
    ``expand_width``).

    ``expand_width`` is the frontier-BATCHED variant: each round expands
    up to that many unexpanded pool entries per query instead of the
    strict best-first one, cutting the dominant cost — driver-synchronized
    join rounds — ~width-fold at the price of scoring some neighbors a
    strict order would have pruned. Width 1 (default) keeps exact
    bit-parity with the broadcast path; wider is recall-gated
    (tests/test_graph.py).

    ``max_degree`` bounds the per-node neighbor-list length for the
    broadcast-size estimates below. When None (the default) it is
    measured as ``max(size(nbrs))`` over the adjacency — one aggregate
    scan, but a GUARANTEED upper bound; pass it only when the true bound
    is known (note the builder's connectivity repair may bridge past
    ``IndexParams.degree_cap``, so the cap alone is NOT that bound —
    but ``save_index`` records the measured bound in the index header,
    so loaded-index callers should thread ``meta["max_degree"]`` here
    instead of re-paying the O(N) scan per search call).
    Sampling a single row here was the r9-verdict hazard: a degree-1
    first row underestimates the candidate side ~10-70x and a giant
    batch could slip past the broadcast gate into Spark's 8 GB
    hard-fail."""
    spark = queries_df.sparkSession
    # the query set is re-joined every round: checkpoint once, and size
    # the per-round broadcast-hint estimates from its REAL row count so
    # a giant query batch degrades to the planner's exchange instead of
    # hard-failing Spark's 8 GB broadcast ceiling (the hints below
    # deliberately bypass the planner's size guard — see hazard #9)
    q = queries_df.select(
        F.col(query_id).alias("qid"), F.col(vec_col).alias("qvec")
    ).localCheckpoint(eager=True)
    n_q = q.count()
    head = q.head()
    dim = len(head["qvec"]) if head is not None else 0
    if max_degree is not None:
        deg = int(max_degree)
    else:
        deg_row = adj_df.agg(F.max(F.size("nbrs")).alias("d")).head()
        deg = int(deg_row["d"]) if deg_row is not None and deg_row["d"] is not None else 1
    frontier_bytes = n_q * expand_width * 24.0
    cand_bytes = n_q * expand_width * max(deg, 1) * 24.0
    q_bytes = n_q * (dim * 8 + 24.0)
    base = base_df.select(F.col(base_id).alias("nn_id"), F.col(vec_col).alias("bvec"))

    # Seed: every query starts at the medoid entry point.
    ep_vec = base.where(F.col("nn_id") == entry_point)
    visited = (
        q.crossJoin(F.broadcast(ep_vec))
        .select(
            "qid",
            "nn_id",
            distance_col(metric, "qvec", "bvec").alias("dist"),
            F.lit(False).alias("expanded"),
        )
    )
    # exclude_self must NOT drop the seed row: a query whose qid equals the
    # entry point still needs the medoid in its pool to have anything to
    # expand (the broadcast path keeps the seed and filters the self row
    # from the final pool only — mirrored below).
    visited = visited.localCheckpoint(eager=True)

    pool_w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("nn_id").asc())

    # stats-reset snapshots reuse ONE scratch dir (overwrite mode): a
    # fresh mkdtemp per reset leaked one full state snapshot per 16
    # rounds for the life of the session — the same scratch-exhaustion
    # class as hazard #9. The dir is removed on exit unless the loop
    # broke with `visited` still BEING the parquet scan (the returned
    # lazy plan then reads it; one bounded dir survives per such call).
    reset_dir: str | None = None
    reset_scan_live = False

    # An exception mid-round (executor loss, interrupt) must not leak the
    # snapshot dir: the returned plan is never materialized on the error
    # path, so the scratch is unconditionally safe to delete there —
    # unlike the success path, which keeps it while the returned lazy
    # plan still reads the snapshot (reset_scan_live).
    # SPARK_GRAFT_ROUND_LOG: per-round wall breakdown (one JSON line per
    # round to stdout) for profiling the driver-sync term — measurement
    # only, no plan change; off outside explicit profiling runs.
    round_log = bool(os.environ.get("SPARK_GRAFT_ROUND_LOG"))
    if round_log:
        import json as _json
        import time as _time

    try:
        for rnd in range(max_rounds):
            t_r0 = _time.time() if round_log else 0.0
            if rnd and rnd % _STATS_RESET_EVERY == 0:
                # stats reset: re-read the state from parquet so estimated
                # sizeInBytes restarts from the actual file size (values
                # unchanged — bit-parity with the broadcast path holds)
                import tempfile

                if reset_dir is None:
                    reset_dir = tempfile.mkdtemp(prefix="mysteryann-stage-")
                state_path = os.path.join(reset_dir, "state")
                visited.write.mode("overwrite").parquet(state_path)
                visited = spark.read.parquet(state_path)
                reset_scan_live = True
            pool = visited.withColumn("rk", F.row_number().over(pool_w)).where(
                F.col("rk") <= l_search
            )
            # one row per live query — tiny; checkpoint so the emptiness probe
            # and the two joins below reuse it instead of re-running the window
            frontier = (
                pool.where(~F.col("expanded"))
                .withColumn("fr", F.row_number().over(pool_w))
                .where(F.col("fr") <= expand_width)
                .select("qid", "nn_id")
                .localCheckpoint(eager=True)
            )
            t_front = _time.time() if round_log else 0.0
            if frontier.isEmpty():
                break
            t_probe = _time.time() if round_log else 0.0

            # expand: frontier ⋈ adjacency → fresh candidate ids per query
            # (anti-join against the PRE-mark state — same id set, already
            # materialized, so the mark join isn't recomputed here).
            # BROADCAST the frontier explicitly: the stats the planner sees
            # for a checkpointed loop state are estimates, and a sort-merge
            # pick here re-shuffles the FULL adjacency every round — scale
            # hazard #9, measured as ~GBs of shuffle write per round at 10^7
            # (local scratch exhaustion in minutes; on a cluster, the whole
            # static index crossing the network once per round). With the
            # hint only the per-round frontier/candidate rows ever move.
            cand = (
                broadcast_if_under(frontier, frontier_bytes)
                .join(adj_df, frontier["nn_id"] == adj_df["node"])
                .select("qid", F.explode("nbrs").alias("nn_id"))
                .dropDuplicates(["qid", "nn_id"])
                .join(visited.select("qid", "nn_id"), ["qid", "nn_id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            t_cand = _time.time() if round_log else 0.0
            if exclude_self:
                cand = cand.where(F.col("nn_id") != F.col("qid"))

            # mark the frontier nodes expanded
            marked = (
                visited.join(
                    broadcast_if_under(
                        frontier.withColumn("mark", F.lit(True)), frontier_bytes
                    ),
                    ["qid", "nn_id"],
                    "left",
                )
                .withColumn("expanded", F.col("expanded") | F.coalesce("mark", F.lit(False)))
                .drop("mark")
            )

            # score: candidate ⋈ base vector ⋈ query vector. The candidate
            # set is per-round small (≤ queries x width x degree rows) while
            # the base side is the whole index — broadcast the candidates so
            # the base is STREAMED in place (scanned, never shuffled), same
            # hazard-#9 reasoning as the expansion join.
            scored = (
                broadcast_if_under(cand, cand_bytes)
                .join(base, "nn_id")
                .join(broadcast_if_under(q, q_bytes), "qid")
                .select(
                    "qid",
                    "nn_id",
                    distance_col(metric, "qvec", "bvec").alias("dist"),
                    F.lit(False).alias("expanded"),
                )
            )
            visited = marked.unionByName(scored).localCheckpoint(eager=True)
            # the eager checkpoint just materialized everything derived from
            # the reset scan — the snapshot files are no longer referenced
            reset_scan_live = False
            if round_log:
                t_end = _time.time()
                print(
                    _json.dumps(
                        {
                            "stage": "round_log",
                            "rnd": rnd,
                            "frontier_s": round(t_front - t_r0, 3),
                            "probe_s": round(t_probe - t_front, 3),
                            "cand_s": round(t_cand - t_probe, 3),
                            "score_union_s": round(t_end - t_cand, 3),
                            "total_s": round(t_end - t_r0, 3),
                        }
                    ),
                    flush=True,
                )
    except BaseException:
        if reset_dir is not None:
            shutil.rmtree(reset_dir, ignore_errors=True)
        raise
    if reset_dir is not None and not reset_scan_live:
        shutil.rmtree(reset_dir, ignore_errors=True)

    # every visited row was scored exactly once; the single seed row is
    # excluded from cmps per the reference's counter convention (matches
    # the broadcast path, which zeroes cmps after scoring the entry point)
    counters = visited.groupBy("qid").agg(
        (F.count("*") - F.lit(1)).cast("int").alias("cmps"),
        F.sum(F.col("expanded").cast("int")).cast("int").alias("hops"),
    )
    # Bound to the top-l_search pool FIRST, then drop the self row, then
    # take k — the same order as the broadcast path's final emit. Filtering
    # self from all visited rows before ranking would let the
    # (l_search+1)-th visited candidate slide into the result when
    # k == l_search and self sits inside the pool, breaking bit-parity.
    final = (
        visited.withColumn("rk", F.row_number().over(pool_w))
        .where(F.col("rk") <= l_search)
        .drop("rk")
    )
    if exclude_self:
        final = final.where(F.col("nn_id") != F.col("qid"))
    return (
        final.withColumn("rank", F.row_number().over(pool_w))
        .where(F.col("rank") <= k)
        .join(counters, "qid")
        .select("qid", "nn_id", "dist", F.col("rank").cast("int"), "cmps", "hops")
    )
