"""Registry-order invariants for the driver's 50-entry correctness window.

The correctness driver gates only the first 50 entries of ``queries()`` in
iteration order (CORRECTNESS_r01..r04.json all stop at exactly 50 rows).
These tests pin the ordering contract so adding a query can never silently
push a not-yet-stable entry past the window (the r2 regression).
"""

from mysteryann_spark.queries.registry import _BACK, _FRONT, all_queries

DRIVER_WINDOW = 50

# Round-13 must-verify set (r12 VERDICT "Next round" #5): the 20
# last-seen-r10 entries (3-round staleness cap trips this round), plus
# every entry whose PLAN changed in round 13 (minhash verify kernel,
# build adj3 single-staging, trainer count+head fusion,
# bipartite footer count).
MUST_BE_IN_WINDOW = {
    # last seen r10 — 3-round cap trips this round
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
    # plan changed in round 13
    "dedup_minhash_lsh",
    "dedup_groups_full",
    "dedup_components",
    "dedup_semantic",
    "pipeline_curate",
    "pipeline_quota_sample",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_hier_topk",
    "ann_ivfpq_persisted",
    "ann_ivfpq_vectors",
    "roargraph_build_ivf",
    "roargraph_insert",
    "roargraph_delete",
    "roargraph_search_topk",
    "roargraph_search_ip",
    "roargraph_search_cosine",
    "roargraph_search_filtered",
    "roargraph_degrees",
    "roargraph_sweep",
    "roargraph_nsg_import",
    "roargraph_save_load_search",
    "roargraph_binary_interop",
    "bipartite_edges",
}


# _FRONT stays at least this far below the window so entries added
# mid-round (which sort between _FRONT and _BACK) land INSIDE the window
# by default instead of silently missing driver verification at 51+.
WINDOW_SLACK = 3


def test_must_verify_entries_inside_driver_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"round-13 must-verify entries outside first 50: {missing}"


def test_front_leads_the_window_with_slack():
    """_FRONT is the curated head of the driver window, kept short of the
    full 50 so new unlisted entries displace _BACK-head backfill (which
    gets re-verified next round anyway) rather than falling outside."""
    names = list(all_queries())
    assert len(_FRONT) <= DRIVER_WINDOW - WINDOW_SLACK
    assert names[: len(_FRONT)] == _FRONT
    # the slack slots hold only new (unlisted) entries or _BACK-head
    # backfill — in _BACK order, so the stalest entries get the slots
    slack = names[len(_FRONT) : DRIVER_WINDOW]
    backfill = [n for n in slack if n in _BACK]
    assert backfill == _BACK[: len(backfill)], (
        f"window slack must backfill from the _BACK head in order: {slack}"
    )


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
    # unlisted (mid-round-added) entries are allowed — that is what the
    # _FRONT slack exists for — but they must FIT the slack, i.e. land
    # inside the driver window rather than silently past it
    n_unlisted = len(names) - len(_FRONT) - len(_BACK)
    assert 0 <= n_unlisted <= DRIVER_WINDOW - len(_FRONT), (
        f"{n_unlisted} unlisted entries exceed the window slack of "
        f"{DRIVER_WINDOW - len(_FRONT)} — seat them in _FRONT/_BACK"
    )
