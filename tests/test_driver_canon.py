"""Driver-canonicalizer compatibility for every registry entry.

The correctness driver hashes each entry's output by pandas-sorting the
collected frame; Array/Map/Struct cells make that sort raise
``TypeError: unhashable type: 'list'`` and the entry records neither rows
nor hash (the r6 ``emb_pca_project`` failure — VERDICT r6 "What's wrong"
#1). The repo's own ``tools/verify_local._canon`` handles lists fine,
which is exactly why this failure mode is invisible to every other local
gate: it must be pinned structurally, on the SCHEMA, for all entries.

Runs at sf0.001 (500-row tables) so eager entries (graph builds, model
fits) stay cheap; only the schema is inspected, never collected.
"""

from __future__ import annotations

import pytest

from mysteryann_spark.queries.registry import all_queries

SF_DIR_TINY = "/root/testdata/sf0.001"

_COMPLEX = ("array", "map", "struct")


def _entry_names() -> list[str]:
    return list(all_queries())


@pytest.mark.parametrize("name", _entry_names())
def test_no_complex_output_columns(spark, name):
    spec = all_queries()[name]
    df = spec.fn(spark, SF_DIR_TINY)
    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.typeName() in _COMPLEX
    ]
    assert not bad, (
        f"registry entry {name} emits complex columns {bad}; the driver's "
        f"canonicalizer (pandas sort_values) crashes on Array/Map/Struct "
        f"cells — flatten (posexplode / to_json / struct field selection) "
        f"before returning"
    )
