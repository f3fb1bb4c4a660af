"""Registry-order invariants for the driver's 50-entry correctness window.

The correctness driver gates only the first 50 entries of ``queries()`` in
iteration order (CORRECTNESS_r01..r04.json all stop at exactly 50 rows).
These tests pin the ordering contract so adding a query can never silently
push a not-yet-stable entry past the window (the r2 regression).
"""

from mysteryann_spark.queries.registry import _BACK, _FRONT, all_queries

DRIVER_WINDOW = 50

# Round-7 must-verify set (r6 VERDICT "Next round" #2): the 19 r4-floor
# entries absent from both the r5 and r6 driver windows (3-round cap
# trips this round), plus the entries whose code or oracle changed in
# round 7 (reshaped emb_pca_project, delta-staged maintenance loops,
# batched search kernel, IVF-PQ ADC batching).
MUST_BE_IN_WINDOW = {
    # r4 floor — 3-round cap trips this round
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
    # changed in round 7
    "emb_pca_project",
    "roargraph_insert",
    "roargraph_delete",
    "roargraph_stream_insert",
    "roargraph_stream_maintain",
    "roargraph_search_topk",
    "roargraph_search_ip",
    "roargraph_search_cosine",
    "roargraph_search_filtered",
    "roargraph_save_load_search",
    "roargraph_search_distributed",
    "bipartite_search_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_persisted",
    "ann_ivf_topk",
}


def test_must_verify_entries_inside_driver_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"round-6 must-verify entries outside first 50: {missing}"


def test_front_fills_the_window_exactly():
    """_FRONT is curated to be exactly the driver window: shorter wastes
    verification slots, longer silently drops its own tail outside."""
    names = list(all_queries())
    assert len(_FRONT) == DRIVER_WINDOW
    assert names[:DRIVER_WINDOW] == _FRONT


def test_only_stable_back_entries_past_window():
    names = list(all_queries())
    stragglers = [n for n in names[DRIVER_WINDOW:] if n not in _BACK]
    assert not stragglers, (
        f"entries past the driver's 50-entry window that are not in the "
        f"stable _BACK list: {stragglers} — reorder registry._FRONT/_BACK"
    )


def test_front_and_back_lists_are_live():
    names = set(all_queries())
    dead_front = [n for n in _FRONT if n not in names]
    dead_back = [n for n in _BACK if n not in names]
    assert not dead_front and not dead_back, (
        f"registry order lists reference missing entries: {dead_front + dead_back}"
    )
    assert len(names) == len(_FRONT) + len(_BACK), (
        "every entry must be explicitly placed in _FRONT or _BACK during "
        "a rotation round (unlisted middle entries are for mid-round adds)"
    )
