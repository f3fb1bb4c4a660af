"""Registry-order invariants for the driver's 50-entry correctness window.

The correctness driver gates only the first 50 entries of ``queries()`` in
iteration order (CORRECTNESS_r01/r02/r03.json all stop at exactly 50 rows).
These tests pin the ordering contract so adding a query can never silently
push a not-yet-stable entry past the window (the r2 regression).
"""

from mysteryann_spark.queries.registry import _BACK, _FRONT, all_queries

DRIVER_WINDOW = 50

# Round-4 must-verify set: the two r3 hash-FAILs whose oracles were fixed,
# everything new or changed in round 4, and the r2-last-verified floor the
# window rotates onto (r3 VERDICT "Next round" #3).
MUST_BE_IN_WINDOW = {
    "events_sessionize",
    "doc_substring_spans",
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
    "events_retention",
    "bucketed_join_revenue",
    "dedup_minhash_lsh",
    "roargraph_sweep",
    "roargraph_search_filtered",
}


def test_must_verify_entries_inside_driver_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"round-4 must-verify entries outside first 50: {missing}"


def test_rotated_floor_inside_driver_window():
    """The 31 entries last driver-verified in r2 (whose modules changed in
    r3) must all sit inside the round-4 window."""
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    floor = set(_FRONT[_FRONT.index("dedup_fingerprint"):])  # rotated-floor section
    missing = floor - window
    assert not missing, f"rotated r2-floor entries outside first 50: {missing}"


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
