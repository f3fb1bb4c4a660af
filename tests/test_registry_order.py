"""Registry-order invariants for the driver's 50-entry correctness window.

The correctness driver gates only the first 50 entries of ``queries()`` in
iteration order (CORRECTNESS_r01/r02.json both stop at exactly 50 rows).
These tests pin the ordering contract so adding a query can never silently
push a not-yet-stable entry past the window again (the r2 regression).
"""

from mysteryann_spark.queries.registry import _BACK, _FRONT, all_queries

DRIVER_WINDOW = 50

# Entries with no driver correctness row in rounds 1-2 (VERDICT r2 missing #1).
NEVER_VERIFIED = {
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
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "ann_cosine_topk",
}


def test_unverified_entries_inside_driver_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    missing = NEVER_VERIFIED - window
    assert not missing, f"never-driver-verified entries outside first 50: {missing}"


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
