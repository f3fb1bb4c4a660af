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
# (CORRECTNESS_r01..r12.json all cut off at exactly 50).  Registry order
# is therefore a verification-coverage decision, not cosmetics.  Round-13
# policy (r12 VERDICT "Next round" #5: rotate onto the stalest cohort,
# keep the rotation ordered):
#
#   * ``_FRONT`` — (a) the 20 last-seen-r10 entries (3 rounds stale —
#     the staleness-cap cohort); (b) every entry whose PLAN changed in
#     round 13 (minhash verify kernel, build adj3 single-staging,
#     trainer job fusion, bipartite footer count).
#   * ``_FRONT`` is deliberately SHORTER than the 50-slot window: the
#     slack means entries added mid-round (unlisted, sorting between
#     _FRONT and _BACK) land inside the window by default instead of
#     silently missing driver verification at position 51+; with no new
#     entries the slack backfills from the _BACK head (the next-stalest
#     r11 entries).
#   * ``_BACK`` — head: the last-seen-r11 remainder (r14's first pick,
#     in its r12 _BACK order), then everything driver-verified in r12,
#     in its r12 window order.
#
# Rows-only note: ``roargraph_sweep`` is rows-only BY DESIGN, not by gap —
# its QPS/latency columns measure the host; its deterministic columns
# (recall, cmps, hops) are hash-pinned via ``roargraph_sweep_quality``.
_FRONT = [
    # (a) the 20 last-seen-r10 entries — 3 rounds stale at r13, the
    # cap-trip cohort (seated in their r12 _BACK order)
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
    # (b) every entry whose PLAN changed in round 13 and is not already
    # seated above: the minhash verify kernel (doc-pair expansion +
    # vectorized intersection), the build's adj3 single-staging, the
    # trainer count+head fusion, and the
    # bipartite footer count — regardless of freshness (a changed plan
    # re-verifies the round it changed)
    "roargraph_insert",
    "roargraph_delete",
    "roargraph_search_topk",
    "roargraph_search_ip",
    "roargraph_search_cosine",
    "roargraph_search_filtered",
    "ann_ivfpq_vectors",
    "ann_ivf_topk",
    "ann_ivfpq_hier_topk",
    "ann_ivfpq_persisted",
    "roargraph_build_ivf",
    "roargraph_binary_interop",
    "dedup_groups_full",
    "pipeline_quota_sample",
    "roargraph_degrees",
    "roargraph_nsg_import",
    "roargraph_save_load_search",
    "ann_pq_topk",
    "dedup_minhash_lsh",
    "roargraph_sweep",
    "dedup_semantic",
    "ann_ivfpq_topk",
    "pipeline_curate",
    "dedup_components",
    "bipartite_edges",
]
_BACK = [
    # last-seen-r11 remainder the window could not seat — r14's FIRST
    # pick (the _FRONT slack backfills the head into the r13 window)
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
    "stream_neardup_docs",
    "bpe_pair_counts",
    "stream_tumbling_oracled",
    "stream_dedup_oracled",
    "pipeline_chunk_documents",
    "doc_unigram_logprob",
    "multimodal_image_features",
    "multimodal_resize",
    "pipeline_shard_manifest",
    "events_retention",
    "bucketed_join_revenue",
    "ann_filtered_topk",
    "dedup_fingerprint",
    "dedup_jaccard_bigram",
    "dedup_exact",
    "doc_rolling_fingerprint",
    "doc_bpe_tokens",
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality",
    "doc_tfidf_topterms",
    "udf_registry_distances",
    # driver-verified in round 12 (fresh), kept in the r12 window order
    "filter_project",
    "topk_orders",
    "window_rank",
    "window_running",
    "semi_join_customers",
    "anti_join_customers",
    "distinct_agg",
    "rollup_customer_balance",
    "emb_pca_project",
    "bipartite_search_topk",
    "roargraph_search_distributed",
    "knn_exact",
    "knn_medoid",
    "knn_recall_l2_vs_cosine",
    "knn_rderr_truncated",
    "ann_cosine_topk",
    "ann_quantized_topk",
    "ann_range_search",
    "ann_lsh_topk",
    "dedup_embedding",
    "dedup_ann_pairs",
    "emb_outlier_zscore",
    "multimodal_audio_stats",
    "fbin_roundtrip_norms",
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
    "grouping_sets_sales",
    "json_events",
    "math_functions",
]


def _driver_window_order(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    front = [n for n in _FRONT if n in merged]
    back = [n for n in _BACK if n in merged]
    listed = set(front) | set(back)
    middle = [n for n in merged if n not in listed]
    return {n: merged[n] for n in front + middle + back}
