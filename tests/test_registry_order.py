"""Registry-order invariants for the driver's 50-entry correctness window.

The correctness driver gates only the first 50 entries of ``queries()`` in
iteration order (CORRECTNESS_r01..r04.json all stop at exactly 50 rows).
These tests pin the ordering contract so adding a query can never silently
push a not-yet-stable entry past the window (the r2 regression).
"""

from mysteryann_spark.queries.registry import _BACK, _FRONT, all_queries

DRIVER_WINDOW = 50

# Round-8 must-verify set (r7 VERDICT "Next round" #1): the 22 r5-floor
# entries absent from both the r6 and r7 driver windows (3-round cap
# trips this round), plus the entries whose oracle changed in round 8
# (the newly pinned streaming maintenance entries and the new
# roargraph_sweep_quality split).
MUST_BE_IN_WINDOW = {
    # r5 floor — 3-round cap trips this round
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
    "multimodal_frame_sample",
    "pipeline_mix_sample",
    "pipeline_pack_sequences",
    "pipeline_profile",
    "pricing_summary",
    "setops_nations",
    "string_functions",
    "vector_normalize",
    "vector_norms",
    # oracle changed in round 8 (pinned this round)
    "roargraph_stream_insert",
    "roargraph_stream_maintain",
    "roargraph_sweep_quality",
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
