"""Registry-order invariants for the driver's 50-entry correctness window.

The correctness driver gates only the first 50 entries of ``queries()`` in
iteration order (CORRECTNESS_r01..r04.json all stop at exactly 50 rows).
These tests pin the ordering contract so adding a query can never silently
push a not-yet-stable entry past the window (the r2 regression).
"""

from mysteryann_spark.queries.registry import _BACK, _FRONT, all_queries

DRIVER_WINDOW = 50

# Round-5 must-verify set: the r4 driver crash (fixed), the three new r5
# entries, the r4-green entries whose code/oracle changed in r5 (the
# rows-only spectral sibling is demoted — its oracled twin hash-covers the
# same codec in-window), and the refactored knn/roargraph family
# (r4 VERDICT "Next round" #1/#3/#5).
MUST_BE_IN_WINDOW = {
    "roargraph_binary_interop",
    "roargraph_search_cosine",
    "roargraph_build_ivf",
    "roargraph_stream_insert",
    "emb_outlier_zscore",
    "ann_ivfpq_persisted",
    "multimodal_audio_stats",
    "knn_exact",
    "ann_cosine_topk",
    "roargraph_degrees",
    "roargraph_search_topk",
    "roargraph_search_ip",
    "roargraph_search_distributed",
    "roargraph_save_load_search",
    "roargraph_insert",
    "bipartite_search_topk",
}


def test_must_verify_entries_inside_driver_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"round-5 must-verify entries outside first 50: {missing}"


def test_rotated_floor_inside_driver_window():
    """The r2-last-verified scalar/relational floor (3 rounds without a
    driver row is the cap) must all sit inside the round-5 window."""
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    floor = set(
        _FRONT[_FRONT.index("string_functions"): _FRONT.index("cube_orders") + 1]
    )
    missing = floor - window
    assert not missing, f"rotated r2-floor entries outside first 50: {missing}"


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
