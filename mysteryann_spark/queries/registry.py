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
    merged = _overlay_pinned(merged)
    return _driver_window_order(merged)


def _overlay_pinned(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Attach pinned VALUES oracles (tools/gen_pinned_oracles.py) to
    deterministic entries that would otherwise be rows-only. A module's
    own oracle always wins — pins only fill gaps."""
    try:
        from mysteryann_spark.queries import _pinned_oracles as pinned
    except ImportError:
        return merged
    for name, sql in getattr(pinned, "PINNED", {}).items():
        spec = merged.get(name)
        if spec is not None and spec.oracle is None:
            merged[name] = QuerySpec(spec.fn, sql)
    return merged


# The correctness driver gates only the FIRST 50 entries in iteration order
# (CORRECTNESS_r01..r11.json all cut off at exactly 50).  Registry order
# is therefore a verification-coverage decision, not cosmetics.  Round-12
# policy (r11 VERDICT "Next round" #1: seat the 18 last-seen-r9 entries
# before the 3-round staleness cap trips):
#
#   * ``_FRONT`` — (a) the 18 last-seen-r9 entries (absent from BOTH the
#     r10 and r11 windows — the 3-round cap trips this round); (b) entries
#     whose PLAN changed in round 12 (routed assignment gained a flat
#     fallback for -1 rows + per-executor float32 centroid memoization;
#     save_ivfpq rebuilds over an existing path now stage to a sibling
#     temp dir and rename-swap); (c) backfill from the last-seen-r10
#     cohort in its r10 window order so r13's rotation stays small.
#   * ``_FRONT`` is deliberately SHORTER than the 50-slot window: the
#     slack means entries added mid-round (unlisted, sorting between
#     _FRONT and _BACK) land inside the window by default instead of
#     silently missing driver verification at position 51+; with no new
#     entries the slack backfills from the _BACK head (the next-stalest).
#   * ``_BACK`` — head: the 23 last-seen-r10 entries the window could not
#     seat this round (r13's FIRST pick, together with whatever the slack
#     does not reach), then everything driver-verified in r11, in its
#     r11 window order.
#
# Rows-only note: ``roargraph_sweep`` is rows-only BY DESIGN, not by gap —
# its QPS/latency columns measure the host; its deterministic columns
# (recall, cmps, hops) are hash-pinned via ``roargraph_sweep_quality``.
_FRONT = [
    # (a) the r9-floor rotation debt — the reason this round's window
    # exists (seated in the old _BACK-head order)
    "filter_project",
    "topk_orders",
    "window_rank",
    "window_running",
    "semi_join_customers",
    "anti_join_customers",
    "distinct_agg",
    "rollup_customer_balance",
    "emb_pca_project",
    "roargraph_insert",
    "roargraph_delete",
    "roargraph_search_topk",
    "roargraph_search_ip",
    "roargraph_search_cosine",
    "roargraph_search_filtered",
    "ann_ivfpq_vectors",
    "bipartite_search_topk",
    "ann_ivf_topk",
    # (b) plan changed in round 12: the hier entry exercises the routed
    # assignment's -1 fallback + executor-memoized float32 centroids;
    # the persisted entry exercises the staged-rename overwrite path
    "ann_ivfpq_hier_topk",
    "ann_ivfpq_persisted",
    # (c) last-seen-r10 backfill so the r13 rotation cohort stays small
    "roargraph_build_ivf",
    "roargraph_binary_interop",
    "knn_exact",
    "knn_medoid",
    "knn_recall_l2_vs_cosine",
    "knn_rderr_truncated",
    "ann_cosine_topk",
    "ann_quantized_topk",
    "ann_range_search",
    "ann_lsh_topk",
    "dedup_embedding",
    "dedup_groups_full",
    "dedup_ann_pairs",
    "emb_outlier_zscore",
    "multimodal_audio_stats",
    "fbin_roundtrip_norms",
    "roargraph_search_distributed",
    "above_avg_balance",
    "brand_sales",
    "case_buckets",
    "cube_orders",
    "date_functions",
    "distance_pairs",
    "doc_gopher_quality",
    "doc_pii_scrub",
    "flagship_revenue_by_nation",
    "funnel_steps",
]
_BACK = [
    # last-seen-r10 remainder the window could not seat — r13's FIRST
    # pick (with no mid-round additions the first 3 backfill into the
    # r12 window through the _FRONT slack)
    "grouping_sets_sales",
    "json_events",
    "math_functions",
    "multimodal_frame_sample",
    "pipeline_mix_sample",
    "pipeline_pack_sequences",
    "pipeline_profile",
    "pricing_summary",
    "setops_nations",
    "string_functions",
    "vector_normalize",
    "vector_norms",
    "roargraph_stream_insert",
    "roargraph_stream_maintain",
    "roargraph_sweep_quality",
    "events_tumbling",
    "events_interval_join",
    "events_sliding",
    "events_asof_click",
    "roargraph_search_distributed_wide",
    "events_pivot",
    "events_approx_distinct",
    "multimodal_decode",
    # driver-verified in round 11 (hash or rows-ran), kept in the r11
    # window order (minus the two moved to _FRONT as plan-changed)
    "dedup_simhash",
    "dedup_simhash_pairs",
    "doc_bm25_topk",
    "doc_substring_spans",
    "emb_pca_variance",
    "events_sessionize",
    "events_transitions",
    "hybrid_rrf_topk",
    "join_skew_topkeys",
    "multimodal_audio_spectral",
    "multimodal_decode_real",
    "multimodal_meanpool",
    "pipeline_decontaminate",
    "pipeline_decontaminate_semantic",
    "pipeline_quota_sample",
    "roargraph_degrees",
    "roargraph_nsg_import",
    "stream_neardup_docs",
    "roargraph_save_load_search",
    "bpe_pair_counts",
    "ann_pq_topk",
    "stream_tumbling_oracled",
    "stream_dedup_oracled",
    "pipeline_chunk_documents",
    "doc_unigram_logprob",
    "multimodal_image_features",
    "multimodal_resize",
    "pipeline_shard_manifest",
    "events_retention",
    "bucketed_join_revenue",
    "dedup_minhash_lsh",
    "roargraph_sweep",
    "ann_filtered_topk",
    "dedup_semantic",
    "dedup_fingerprint",
    "dedup_jaccard_bigram",
    "ann_ivfpq_topk",
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
]


def _driver_window_order(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    front = [n for n in _FRONT if n in merged]
    back = [n for n in _BACK if n in merged]
    listed = set(front) | set(back)
    middle = [n for n in merged if n not in listed]
    return {n: merged[n] for n in front + middle + back}
