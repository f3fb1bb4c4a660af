from mysteryann_spark.operators.knn import knn_join, knn_join_arrays, medoid
from mysteryann_spark.operators.prune import occlusion_prune_np, prune_candidates
from mysteryann_spark.operators.bipartite import build_bipartite, degree_stats
from mysteryann_spark.operators.projection import build_roargraph
from mysteryann_spark.operators.search import search_graph
from mysteryann_spark.operators.evaluate import recall_at_k, relative_distance_error

__all__ = [
    "occlusion_prune_np",
    "prune_candidates",
    "knn_join",
    "knn_join_arrays",
    "medoid",
    "build_bipartite",
    "degree_stats",
    "build_roargraph",
    "search_graph",
    "recall_at_k",
    "relative_distance_error",
]
