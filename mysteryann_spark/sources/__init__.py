from mysteryann_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from mysteryann_spark.sources.graph_io import (
    save_adjacency,
    load_adjacency,
    save_index,
    load_index,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "save_adjacency",
    "load_adjacency",
    "save_index",
    "load_index",
]
