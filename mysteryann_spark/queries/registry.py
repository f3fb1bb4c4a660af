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
    return merged
